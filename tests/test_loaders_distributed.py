"""Data loaders, prefetch, ZeRO-1 sharding on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from metatransformer_tpu.data import loaders
from metatransformer_tpu.parallel import distributed, mesh as pmesh


def test_numpy_loader():
    arrays = {"input": np.arange(20).reshape(10, 2), "label": np.arange(10)}
    loader = loaders.NumpyLoader(arrays, batch_size=3, shuffle=True, seed=0)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    all_labels = np.concatenate([b["label"] for b in batches])
    assert len(set(all_labels.tolist())) == 9  # no dupes within epoch


def test_prefetch_to_device():
    arrays = {"x": np.arange(8, dtype=np.float32).reshape(4, 2)}
    loader = loaders.NumpyLoader(arrays, 2, shuffle=False)
    out = list(loaders.prefetch_to_device(loader, size=2))
    assert len(out) == 2
    assert isinstance(out[0]["x"], jax.Array)


def test_norm_stats_and_normalize():
    specs = [np.full((4, 4), 2.0), np.full((4, 4), 4.0)]
    mean, std = loaders.dataset_norm_stats(specs)
    assert mean == 3.0 and abs(std - 1.0) < 1e-6
    normed = loaders.normalize_spectrogram(np.full((2, 2), 5.0), mean, std)
    np.testing.assert_allclose(normed, 1.0)


def test_ett_csv_windows(tmp_path):
    import pandas as pd

    n = 60
    dates = pd.date_range("2020-01-01", periods=n, freq="h")
    df = pd.DataFrame({"date": dates})
    for c in range(3):
        df[f"v{c}"] = np.arange(n, dtype=np.float32) + c
    path = tmp_path / "ett.csv"
    df.to_csv(path, index=False)
    data = loaders.load_ett_csv(str(path), seq_len=24, label_len=12, pred_len=6)
    assert data["x_enc"].shape == (31, 24, 3)
    assert data["x_mark_enc"].shape == (31, 24, 4)
    assert data["x_dec"].shape == (31, 18, 3)
    assert data["y"].shape == (31, 6, 3)
    # decoder prediction region is zeroed
    np.testing.assert_array_equal(data["x_dec"][:, 12:], 0.0)
    # marks: hour column cycles 0..23
    assert data["x_mark_enc"][0, :, 3].tolist() == list(range(24))


def test_zero1_sharding_on_mesh():
    mesh = pmesh.make_mesh(8, model=1)
    params = {"w": jnp.ones((64, 16)), "b": jnp.ones((3,)), "s": jnp.float32(1.0)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    sharded = distributed.zero1_sharding(opt_state, mesh)
    mu = sharded[0].mu
    # largest divisible dim of [64, 16] leaves sharded over 8 devices
    assert "data" in str(mu["w"].sharding.spec)
    # small/scalar leaves replicated
    assert mu["s"].sharding.spec == P()
    # a sharded train step still works
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def step(g, s, p):
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    with mesh:
        new_params, _ = step(grads, sharded, params)
    assert np.isfinite(np.asarray(new_params["w"])).all()


def test_local_process_slice():
    sl = distributed.local_process_slice(32)
    assert sl == slice(0, 32)  # single process


def test_train_cli_smoke(tmp_path):
    import os

    from metatransformer_tpu import train_cli

    cfg_path = os.path.join(
        os.path.dirname(train_cli.__file__),
        "configs", "speechcommands_metatransformer.yaml",
    )
    rc = train_cli.main([
        "--cfg", cfg_path,
        "--epochs", "1",
        "--steps-per-epoch", "2",
        "--work-dir", str(tmp_path),
        "train.batch_size=4",
        "model.num_classes=5",
        "encoder.scale=tiny",
        "model.tokenizer.num_mel_bins=32",
        "train.audio_length=32",
    ])
    assert rc == 0
