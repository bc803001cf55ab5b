"""Clean-room CLIP byte-level BPE (tokenizers/bpe.py): vocab layout,
word splitting, ranked merging, tokenize framing — the host-side half of
the reference's ``clip.tokenize`` path (Data2Seq/Text.py:9)."""

import numpy as np
import pytest

from metatransformer_tpu.tokenizers import bpe


def test_bytes_to_unicode_bijection():
    m = bpe.bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("a")] == "a"  # printable ascii maps to itself
    assert all(len(c) == 1 for c in m.values())


def test_word_split_contractions_letters_digits():
    words = bpe._word_split("don't stop me 42!!")
    assert words == ["don", "'t", "stop", "me", "4", "2", "!!"]


def test_fallback_vocab_layout():
    tok = bpe.CLIPBPE()
    # 256 byte symbols + 256 </w> symbols + 2 specials
    assert tok.vocab_size == 514
    assert tok.sot_id == 512 and tok.eot_id == 513
    assert tok.encoder["a"] < 256
    assert tok.encoder["a</w>"] == tok.encoder["a"] + 256


def test_fallback_roundtrip():
    tok = bpe.CLIPBPE()
    text = "Hello  World, 123 café!"
    ids = tok.encode(text)
    # lowercase + whitespace collapse are part of the protocol; like
    # CLIP's decoder, every BPE word ends in a space (</w>), so
    # punctuation comes back space-separated.
    assert tok.decode(ids) == "hello world , 1 2 3 café !"


def test_merges_apply_in_rank_order():
    # "hello" -> h e l l o</w>; rank0 (l,l) -> ll; rank1 (ll,o</w>) -> llo</w>
    tok = bpe.CLIPBPE(merges=(("l", "l"), ("ll", "o</w>"), ("h", "e")))
    sym = tok._bpe("hello")
    # (h,e) rank 2 also applies after the lower ranks
    assert sym == ("he", "llo</w>")
    ids = tok.encode("hello")
    assert ids == [tok.encoder["he"], tok.encoder["llo</w>"]]
    # merge ids sit after the 512 byte symbols, before the specials
    assert tok.encoder["ll"] == 512
    assert tok.sot_id == 512 + 3


def test_end_of_word_marker_distinguishes_positions():
    tok = bpe.CLIPBPE(merges=(("a", "b"),))
    # "ab" at word end: last symbol is b</w>, so (a,b) does NOT merge
    assert tok._bpe("ab") == ("a", "b</w>")
    # mid-word it does
    assert tok._bpe("abc") == ("ab", "c</w>")


def test_tokenize_framing_and_truncation():
    tok = bpe.CLIPBPE()
    out = tok.tokenize(["hi", "a much longer sentence " * 20])
    assert out.shape == (2, 77) and out.dtype == np.int32
    assert out[0, 0] == tok.sot_id
    row = out[0]
    eot_pos = int(np.argmax(row))  # EOT has the highest id
    assert row[eot_pos] == tok.eot_id
    assert (row[eot_pos + 1 :] == 0).all()
    # over-long input truncates with EOT last
    assert out[1, -1] == tok.eot_id
    with pytest.raises(ValueError):
        tok.tokenize(["a much longer sentence " * 20], truncate=False)


def test_merges_file_loader(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text("#version: test\nl l\nll o</w>\nh e\n")
    tok = bpe.CLIPBPE.from_file(str(p))
    assert tok.merges == (("l", "l"), ("ll", "o</w>"), ("h", "e"))
    assert tok._bpe("hello") == ("he", "llo</w>")


def test_raw_string_to_features_end_to_end():
    """demo path: raw string -> BPE ids -> CLIP tower -> [B, 1, 768]."""
    import jax

    from metatransformer_tpu.tokenizers import text as text_tok

    tok = bpe.CLIPBPE()
    ids = tok.tokenize(["a photo of a cat", "a dog"])
    cfg = text_tok.TextTokenizerConfig(width=64, depth=2, num_heads=4)
    params = text_tok.init(cfg, jax.random.PRNGKey(0))
    out = text_tok.apply(params, ids, cfg)
    assert out.shape == (2, 1, 768)
    assert np.isfinite(np.asarray(out)).all()
    # 512-d CLIP embedding zero-padded up to 768 (Text.py:15-19)
    assert (np.asarray(out)[:, :, cfg.proj_dim :] == 0).all()
