"""Deployment export: serialize a forward fn to a self-contained artifact.

The reference deploys by shipping the Python model zoo + ``.pth`` weights
and re-instantiating torch modules at the target (per-subproject demo/test
scripts). The TPU-native deployment story is ahead-of-time: ``jax.export``
lowers the jitted forward to StableHLO with the weights baked in as
constants, producing ONE file that any JAX runtime can deserialize and
call — no model code, no checkpoint plumbing, no Python class zoo at the
serving target. (Beyond-reference surface; closest analogue is the
per-task inference entry points, e.g. ``Image/segmentation/image_demo.py``.)

Batch-symbolic export: the leading (batch) axis can be exported as a
symbolic dimension ``b``, so one artifact serves any batch size without
a bucket ladder or recompiles. Token/feature axes stay static — XLA's
tiling (and the Pallas kernels) want static shapes there.

CLI:
  python -m metatransformer_tpu.export --cfg configs/<recipe>.yaml \
      --out model.jaxexport [--smoke] [--batch 8 | --symbolic-batch]
  # later, anywhere:
  exported = metatransformer_tpu.export.load("model.jaxexport")
  logits = exported.call(raw_batch)
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
from jax import export as jexport
import jax.numpy as jnp
import numpy as np


def _batch_symbolic_specs(example_args: Tuple[Any, ...]):
    """ShapeDtypeStructs with every leaf's leading axis -> symbolic ``b``.

    All leaves must share the batch axis (true for every recipe forward:
    raw input pytrees are batched on axis 0).
    """
    (b,) = jexport.symbolic_shape("b")

    def spec(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            raise ValueError("scalar leaf cannot carry a batch axis")
        return jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype)

    return jax.tree.map(spec, example_args)


def export_forward(
    fn: Callable,
    example_args: Tuple[Any, ...],
    *,
    symbolic_batch: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Lower ``fn(*example_args)`` to a serialized StableHLO artifact.

    ``fn`` must close over its params (they are baked into the artifact
    as constants — the artifact is self-contained). ``platforms`` defaults
    to the current backend; pass e.g. ("cpu", "tpu") for a portable
    artifact (each platform is lowered and embedded).
    """
    args = (
        _batch_symbolic_specs(tuple(example_args))
        if symbolic_batch
        else tuple(jnp.asarray(a) for a in example_args)
    )
    exp = jexport.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*args)
    return exp.serialize()


def save(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def deserialize_bytes(blob: bytes) -> "jexport.Exported":
    return jexport.deserialize(bytearray(blob))


def load(path: str) -> "jexport.Exported":
    """-> Exported; run it with ``.call(*args)`` (jit-compatible)."""
    with open(path, "rb") as f:
        return deserialize_bytes(f.read())


# ---------------------------------------------------------------------------
# recipe surface: raw batch -> logits with the recipe's params baked in
# ---------------------------------------------------------------------------


def export_recipe(
    cfg_path: str,
    out_path: str,
    *,
    smoke: bool = False,
    ckpt: Optional[str] = None,
    batch: int = 1,
    symbolic_batch: bool = False,
    seed: int = 0,
) -> "jexport.Exported":
    """Build a recipe's model (optionally restoring a converted encoder
    checkpoint), bake the params into an inference fn, export, save."""
    from metatransformer_tpu import recipes
    from metatransformer_tpu.configs import load_config

    cfg = load_config(cfg_path)
    key = jax.random.key(seed)
    recipe = recipes.build(cfg, key, smoke=smoke)
    params = recipe.params
    if ckpt is not None:
        from metatransformer_tpu.core import convert

        enc_params, _ = convert.load_npz(ckpt)
        params = {**params, "encoder": enc_params}
    forward = recipe.forward

    def infer(x):
        return forward(params, x, None)

    example = next(iter(recipe.synth(batch, 1, seed)))["input"]
    blob = export_forward(
        infer, (example,), symbolic_batch=symbolic_batch
    )
    save(out_path, blob)
    return load(out_path)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--symbolic-batch", action="store_true",
        help="export the batch axis as a symbolic dim (one artifact, any "
             "batch size); token axes stay static",
    )
    p.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="lower for this backend (default: the session's device); "
             "e.g. --platform cpu exports a portable artifact without "
             "touching the TPU",
    )
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    exp = export_recipe(
        args.cfg, args.out,
        smoke=args.smoke, ckpt=args.ckpt,
        batch=args.batch, symbolic_batch=args.symbolic_batch,
    )
    print(
        f"exported {args.cfg} -> {args.out} "
        f"(platforms={exp.platforms}, in_avals={[str(a) for a in exp.in_avals]})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
