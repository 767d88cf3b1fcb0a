"""Checkpoint pytree IO and the ReID training CLI on a synthetic dataset."""

import os
import subprocess
import sys

import numpy as np
import pytest

from yolo_deepsort_tpu.utils.checkpoint import (
    load_pytree,
    load_reid_checkpoint_npz,
    save_pytree,
    save_reid_checkpoint,
)


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6).reshape(2, 3).astype(np.float32),
        "nested": {"b": np.float64(3.5), "c": None},
        "seq": [np.ones(2), {"d": np.zeros(1)}, None],
        "tup": (np.int32(7), np.arange(3)),
    }
    path = tmp_path / "t.npz"
    save_pytree(path, tree)
    back = load_pytree(path)
    np.testing.assert_array_equal(back["a"], tree["a"])
    assert back["nested"]["c"] is None
    assert isinstance(back["seq"], list) and len(back["seq"]) == 3
    assert isinstance(back["tup"], tuple)
    np.testing.assert_array_equal(back["tup"][1], np.arange(3))


def test_pytree_roundtrip_adversarial_keys(tmp_path):
    """Key types and marker-lookalike keys survive (round-1 advisor finding:
    int keys were stringified and '__'-prefixed keys collided with the
    sequence-marker detection)."""
    tree = {
        5: np.arange(2.0),       # int key must come back as int
        "5": np.arange(3.0),     # distinct from int 5
        "__T3__": np.ones(1),    # old-format marker lookalike
        "a/b": np.zeros(2),      # path separator in key
        "": np.full(1, 7.0),     # empty key
        "%2F": np.full(1, 9.0),  # quote-escape lookalike
    }
    path = tmp_path / "adv.npz"
    save_pytree(path, tree)
    back = load_pytree(path)
    assert set(back) == set(tree)
    for k in tree:
        np.testing.assert_array_equal(back[k], tree[k])
    assert isinstance([k for k in back if k == 5][0], int)


def test_restore_like_optax_opt_state(tmp_path):
    """Optimizer state round-trips through npz and restore_like brings the
    optax NamedTuple node types back so tx.update still works (round-1
    advisor: --resume crashed on plain-tuple opt_state)."""
    import jax
    import jax.numpy as jnp
    import optax

    from yolo_deepsort_tpu.utils.checkpoint import restore_like

    # int module indices incl. >=10 to exercise numeric-vs-string sort order
    params = {2: {"w": jnp.ones((2, 2))}, 10: {"b": jnp.zeros(3)}}
    tx = optax.chain(
        optax.add_decayed_weights(1e-4), optax.sgd(0.1, momentum=0.9)
    )
    opt_state = tx.init(params)
    path = tmp_path / "opt.npz"
    save_pytree(path, {"opt": opt_state, "params": params})
    back = load_pytree(path)
    params2 = restore_like(params, back["params"])
    assert set(params2) == {2, 10}
    opt2 = restore_like(opt_state, back["opt"])
    grads = jax.tree.map(jnp.ones_like, params2)
    updates, _ = tx.update(grads, opt2, params2)  # needs real NamedTuples
    new_params = optax.apply_updates(params2, updates)
    assert np.isfinite(np.asarray(new_params[2]["w"])).all()


def test_tracker_state_checkpoint_roundtrip(tmp_path):
    """Tracker runtime state is checkpointable (SURVEY.md section 5.4)."""
    from yolo_deepsort_tpu.config import TrackerConfig
    from yolo_deepsort_tpu.tracking.tracker import TrackerState, init_tracker_state

    cfg = TrackerConfig(max_tracks=8, max_dets=4, feat_dim=16, nn_budget=5)
    state = init_tracker_state(cfg)
    path = tmp_path / "state.npz"
    save_pytree(path, state._asdict())
    back = load_pytree(path)
    restored = TrackerState(**{k: back[k] for k in state._fields})
    for f in state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, f)), np.asarray(getattr(restored, f))
        )


def _make_reid_dataset(root, n_ids=3, n_imgs=4, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split in ("train", "test"):
        for i in range(n_ids):
            d = os.path.join(root, split, f"{i:04d}")
            os.makedirs(d, exist_ok=True)
            base = rng.integers(0, 255, 3)
            for j in range(n_imgs):
                img = np.clip(
                    base + rng.normal(0, 20, (128, 64, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(d, f"{j}.jpg"))


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="full CLI subprocess run compiles the ReID train graph 3x on one "
    "CPU core (~8 min); set RUN_SLOW=1 to enable",
)
def test_reid_cli_train_and_eval(tmp_path):
    """One epoch of the training CLI on a 3-identity synthetic dataset must
    run, checkpoint, and the test/evaluate subcommands must consume it."""
    pytest.importorskip("PIL")
    data = tmp_path / "data"
    _make_reid_dataset(str(data))
    # query/gallery for the test subcommand
    os.symlink(data / "test", data / "query")
    os.symlink(data / "train", data / "gallery")
    ckpt = tmp_path / "ckpt.npz"
    feats = tmp_path / "features.npz"

    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env()
    base = [
        sys.executable, "-m", "yolo_deepsort_tpu.train.reid_cli",
    ]
    common = [
        "--data-dir", str(data), "--ckpt", str(ckpt),
        "--features", str(feats), "--batch-size", "6",
    ]
    r = subprocess.run(
        base + ["train"] + common + ["--epochs", "1", "--log-interval", "1",
                                     "--lr", "0.01"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=1500,  # one-core jit compile of the train graph is ~8-12 min
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert ckpt.exists()
    ck = load_reid_checkpoint_npz(ckpt)
    assert "net_dict" in ck and int(ck["epoch"]) == 0

    r = subprocess.run(
        base + ["test"] + common,
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    z = np.load(feats)
    assert z["query"].shape[1] == 512
    np.testing.assert_allclose(
        np.linalg.norm(z["query"], axis=1), 1.0, rtol=1e-4
    )

    r = subprocess.run(
        base + ["evaluate"] + common,
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rank-1" in r.stdout


def test_reid_cli_fast_paths(tmp_path):
    """Dataset listing + augmentation + the numpy-only evaluate subcommand
    (the jitted train path is covered in-process by test_parallel_train)."""
    pytest.importorskip("PIL")
    from yolo_deepsort_tpu.train.reid_cli import (
        _augment,
        _normalize,
        list_image_folder,
    )

    data = tmp_path / "data"
    _make_reid_dataset(str(data), n_ids=2, n_imgs=2)
    paths, labels, c2i = list_image_folder(str(data / "train"))
    assert len(paths) == 4 and sorted(set(labels)) == [0, 1]
    assert c2i == {"0000": 0, "0001": 1}

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (128, 64, 3), np.uint8)
    aug = _augment(img, rng)
    assert aug.shape == (128, 64, 3)
    norm = _normalize(img[None])
    assert norm.shape == (1, 128, 64, 3)
    assert abs(norm.mean()) < 3

    # evaluate subcommand: numpy only, no jit
    feats = tmp_path / "features.npz"
    q = rng.normal(size=(5, 512)); q /= np.linalg.norm(q, axis=1, keepdims=True)
    np.savez(feats, query=q, query_labels=np.arange(5),
             gallery=q, gallery_labels=np.arange(5))
    r = subprocess.run(
        [sys.executable, "-m", "yolo_deepsort_tpu.train.reid_cli", "evaluate",
         "--features", str(feats)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
        env=__import__("conftest").cpu_subprocess_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rank-1: 1.0000" in r.stdout


def test_reid_checkpoint_resume_fields(tmp_path):
    from yolo_deepsort_tpu.train.reid_train import init_train_params

    params, stats = init_train_params(num_classes=4, seed=0)
    path = tmp_path / "ck.npz"
    save_reid_checkpoint(path, params, acc=0.5, epoch=3, stats=stats)
    ck = load_reid_checkpoint_npz(path)
    assert float(ck["acc"]) == 0.5 and int(ck["epoch"]) == 3
    np.testing.assert_array_equal(
        ck["net_dict"]["stem"]["w"], params["stem"]["w"]
    )
