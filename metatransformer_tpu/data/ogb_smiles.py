"""PCQM4Mv2 adapter: host-side SMILES -> TokenGT graph featurizer in the
OGB atom/bond table layout.

Reference: ``Graph/metatransformer/data/ogb_datasets/pcqm4mv2_pyg.py``
(smiles2graph via ogb.utils) and the OGB feature tables
(9 atom features, 3 bond features). The reference shells out to
rdkit+ogb; this is a self-contained clean-room featurizer for the
organic-chemistry subset PCQM4Mv2 actually uses (B C N O F Si P S Cl
Br I + charges/ring/aromatic SMILES syntax).

Feature layout (ogb.utils.features):
  atom:  [atomic_num_idx, chirality, degree, formal_charge, num_H,
          num_radical_e, hybridization, is_aromatic, is_in_ring]
  bond:  [bond_type, bond_stereo, is_conjugated]
Fields rdkit derives from full chemistry (chirality, radicals,
hybridization, stereo) default to 0/"unspecified" — they are embedding
indices, so downstream shapes and training behavior are identical; the
chemically-derivable fields (degree, charge, implicit H via standard
valence, aromaticity, ring membership) are computed exactly.

The tokenizer's +1 offsets (padding id 0) are applied by
``graph_collate.collate`` downstream, matching ``Data2Seq/Graph.py``.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

# index into the OGB atomic-number list is atomic_num - 1 (list is 1..119)
_SYMBOLS = {
    "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Si": 14, "P": 15, "S": 16,
    "Cl": 17, "Br": 35, "I": 53, "H": 1,
}
# standard valences for implicit-H counting
_VALENCE = {5: 3, 6: 4, 7: 3, 8: 2, 9: 1, 14: 4, 15: 3, 16: 2, 17: 1,
            35: 1, 53: 1, 1: 1}

_BOND_ORDER = {"-": 1, "=": 2, "#": 3, ":": 1.5}
# OGB bond-type ids: SINGLE=0, DOUBLE=1, TRIPLE=2, AROMATIC=3
_BOND_TYPE_ID = {1: 0, 2: 1, 3: 2, 1.5: 3}

_ATOM_RE = re.compile(
    r"(\[[^\]]+\])|(Cl|Br|Si)|([BCNOFPSI])|([bcnops])|([-=#:/\\.])|"
    r"([\(\)])|(%\d\d)|(\d)"
)


@dataclasses.dataclass
class _Atom:
    atomic_num: int
    aromatic: bool = False
    charge: int = 0
    explicit_h: Optional[int] = None  # set by bracket atoms
    in_ring: bool = False
    bond_order_sum: float = 0.0
    degree: int = 0


def _parse_bracket(tok: str) -> _Atom:
    """[13CH2+], [nH], [O-] ... isotopes ignored, charge/H parsed."""
    body = tok[1:-1]
    m = re.match(
        r"^(\d+)?([A-Za-z][a-z]?)(@{1,2})?(H(\d+)?)?([+-]\d*|[+-]+)?", body
    )
    if not m:
        raise ValueError(f"unparseable bracket atom {tok!r}")
    sym = m.group(2)
    aromatic = sym.islower()
    num = _SYMBOLS.get(sym.capitalize() if len(sym) == 1 else sym.title())
    if num is None:
        raise ValueError(f"unknown element in {tok!r}")
    nh = 0
    if m.group(4):
        nh = int(m.group(5)) if m.group(5) else 1
    charge = 0
    cg = m.group(6)
    if cg:
        if cg in ("+", "-"):
            charge = 1 if cg == "+" else -1
        elif set(cg) <= {"+", "-"}:
            charge = cg.count("+") - cg.count("-")
        else:
            charge = int(cg[1:]) * (1 if cg[0] == "+" else -1)
    return _Atom(num, aromatic=aromatic, charge=charge, explicit_h=nh)


def parse_smiles(smiles: str) -> Tuple[List[_Atom], List[Tuple[int, int, float]]]:
    """-> (atoms, bonds [(i, j, order)]); aromatic bonds get order 1.5."""
    atoms: List[_Atom] = []
    bonds: List[Tuple[int, int, float]] = []
    stack: List[int] = []
    prev: Optional[int] = None
    pending_bond: Optional[float] = None
    rings: Dict[str, Tuple[int, Optional[float]]] = {}

    def add_bond(i: int, j: int, order: Optional[float]):
        if order is None:
            order = 1.5 if (atoms[i].aromatic and atoms[j].aromatic) else 1.0
        bonds.append((i, j, order))
        atoms[i].bond_order_sum += order
        atoms[j].bond_order_sum += order
        atoms[i].degree += 1
        atoms[j].degree += 1

    for m in _ATOM_RE.finditer(smiles):
        tok = m.group(0)
        if tok == ".":
            prev, pending_bond = None, None
            continue
        if tok in "-=#:/\\":
            if tok in _BOND_ORDER:
                pending_bond = _BOND_ORDER[tok]
            continue
        if tok == "(":
            stack.append(prev)
            continue
        if tok == ")":
            prev = stack.pop()
            continue
        if tok[0] == "%" or tok.isdigit():
            key = tok
            if key in rings:
                j, order0 = rings.pop(key)
                add_bond(prev, j, pending_bond or order0)
                atoms[prev].in_ring = True
                atoms[j].in_ring = True
            else:
                rings[key] = (prev, pending_bond)
            pending_bond = None
            continue
        # an atom token
        if tok.startswith("["):
            atom = _parse_bracket(tok)
        elif tok in ("Cl", "Br", "Si") or tok in "BCNOFPSI":
            atom = _Atom(_SYMBOLS[tok])
        else:  # aromatic organic subset
            atom = _Atom(_SYMBOLS[tok.upper()], aromatic=True)
        atoms.append(atom)
        idx = len(atoms) - 1
        if prev is not None:
            add_bond(prev, idx, pending_bond)
        prev = idx
        pending_bond = None
    if rings:
        raise ValueError(f"unclosed ring bonds in {smiles!r}: {sorted(rings)}")
    _mark_rings(atoms, bonds)
    return atoms, bonds


def _mark_rings(atoms: List[_Atom], bonds: List[Tuple[int, int, float]]) -> None:
    """Ring perception: an atom is in a ring iff one of its bonds lies on
    a cycle (the bond's endpoints stay connected with the bond removed)."""
    adj: Dict[int, List[Tuple[int, int]]] = {}
    for bi, (i, j, _o) in enumerate(bonds):
        adj.setdefault(i, []).append((j, bi))
        adj.setdefault(j, []).append((i, bi))

    def connected_without(src: int, dst: int, skip_bond: int) -> bool:
        seen = {src}
        stack = [src]
        while stack:
            u = stack.pop()
            if u == dst:
                return True
            for v, bi in adj.get(u, ()):
                if bi != skip_bond and v not in seen:
                    seen.add(v)
                    stack.append(v)
        return False

    for bi, (i, j, _o) in enumerate(bonds):
        if connected_without(i, j, bi):
            atoms[i].in_ring = True
            atoms[j].in_ring = True


def _implicit_h(atom: _Atom) -> int:
    if atom.explicit_h is not None:
        return atom.explicit_h
    val = _VALENCE.get(atom.atomic_num, 0) + atom.charge * (
        1 if atom.atomic_num in (5, 6, 7, 15) else -1
    )
    used = atom.bond_order_sum
    if atom.aromatic:
        # aromatic ring atom: each aromatic bond counted 1.5; standard
        # aromatic H rule (e.g. benzene c has 1 H)
        used = np.ceil(used)
    return int(max(val - used, 0))


def smiles2graph(smiles: str) -> Dict[str, np.ndarray]:
    """-> the OGB graph dict: node_feat [n, 9], edge_index [2, 2e]
    (both directions, ogb convention), edge_feat [2e, 3], num_nodes."""
    atoms, bonds = parse_smiles(smiles)
    node_feat = np.zeros((len(atoms), 9), np.int64)
    for i, a in enumerate(atoms):
        node_feat[i, 0] = a.atomic_num - 1  # ogb atomic-num index
        node_feat[i, 1] = 0  # chirality unspecified (rdkit-only)
        node_feat[i, 2] = min(a.degree, 10)
        node_feat[i, 3] = a.charge + 5  # ogb offsets charge by +5
        node_feat[i, 4] = min(_implicit_h(a), 8)
        node_feat[i, 5] = 0  # radical electrons
        node_feat[i, 6] = 0  # hybridization unspecified (rdkit-only)
        node_feat[i, 7] = int(a.aromatic)
        node_feat[i, 8] = int(a.in_ring)
    ei, ef = [], []
    for i, j, order in bonds:
        feat = [_BOND_TYPE_ID[order], 0, int(order == 1.5)]
        ei.append((i, j))
        ef.append(feat)
        ei.append((j, i))
        ef.append(feat)
    return {
        "node_feat": node_feat,
        "edge_index": (
            np.asarray(ei, np.int64).T if ei else np.zeros((2, 0), np.int64)
        ),
        "edge_feat": (
            np.asarray(ef, np.int64) if ef else np.zeros((0, 3), np.int64)
        ),
        "num_nodes": len(atoms),
    }


def graph_to_collate_format(g: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """OGB graph dict -> the ``graph_collate.collate`` input record
    (node_data/edge_index/edge_data, edges single-direction)."""
    e = g["edge_index"].T[::2]  # keep one direction; collate re-pads
    return {
        "node_data": g["node_feat"].astype(np.int32),
        "edge_index": e.astype(np.int32),
        "edge_data": g["edge_feat"][::2].astype(np.int32),
    }


def load_pcqm4mv2_csv(path: str, limit: Optional[int] = None):
    """``data.csv.gz``-style rows (idx, smiles, homolumogap) -> list of
    (smiles, target). Accepts plain csv too (the fixture case)."""
    import csv
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    out = []
    with opener(path, "rt") as f:
        reader = csv.DictReader(f)
        for row in reader:
            out.append((row["smiles"], float(row["homolumogap"])))
            if limit and len(out) >= limit:
                break
    return out
