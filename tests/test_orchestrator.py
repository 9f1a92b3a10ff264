"""Pipeline-overlap orchestration: producer (fake gen/mask/score fns) fills
a LivePool while a consumer samples paste batches, then the full chain
feeds the device compositor."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.pipeline.orchestrator import InstanceProducer, LivePool
from divergen_tpu.ops.copy_paste import paste_instances_boxframe


def fake_generate(cat, rng):
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    return imgs


def fake_mask(images):
    m = np.zeros(images.shape[:3], bool)
    m[:, 8:24, 8:24] = True
    return m


def fake_score(images, masks, cat):
    return np.full(len(images), 0.9)


def test_producer_fills_pool_and_sampling_works():
    pool = LivePool(patch_size=16, train_size=(64, 64), max_samples=4)
    prod = InstanceProducer(
        pool, categories=[3, 7], generate_fn=fake_generate, mask_fn=fake_mask,
        score_fn=fake_score, clip_threshold=0.5, max_rounds=3,
    )
    prod.start()
    prod.join(timeout=30)
    assert prod.produced == 2 * 2 * 3
    counts = pool.counts()
    assert counts[3] == 6 and counts[7] == 6

    rng = np.random.default_rng(0)
    got_any = False
    for _ in range(10):
        s = pool.make_paste_sample(rng, max_pastes=3)
        if s["patch_valid"].any():
            got_any = True
            k = np.where(s["patch_valid"])[0][0]
            assert s["patches"][k, ..., 3].max() == 1.0
            assert s["patch_classes"][k] in (3, 7)
    assert got_any


def test_producer_rejects_low_scores():
    pool = LivePool(patch_size=16)
    prod = InstanceProducer(
        pool, categories=[1], generate_fn=fake_generate, mask_fn=fake_mask,
        score_fn=lambda i, m, c: np.zeros(len(i)), clip_threshold=0.5, max_rounds=2,
    )
    prod.start()
    prod.join(timeout=30)
    assert prod.produced == 0 and prod.rejected == 4
    assert pool.counts() == {}


def test_live_pool_feeds_device_compositor():
    pool = LivePool(patch_size=16, train_size=(64, 64), max_samples=4)
    prod = InstanceProducer(
        pool, categories=[2], generate_fn=fake_generate, mask_fn=fake_mask,
        score_fn=fake_score, clip_threshold=0.5, max_rounds=1,
    )
    prod.start()
    prod.join(timeout=30)
    rng = np.random.default_rng(1)
    s = None
    for _ in range(20):
        s = pool.make_paste_sample(rng, max_pastes=2)
        if s["patch_valid"].any():
            break
    assert s is not None and s["patch_valid"].any()
    out = paste_instances_boxframe(
        jnp.zeros((64, 64, 3)),
        jnp.ones((1, 8, 8), jnp.float32),
        jnp.array([[10.0, 10.0, 30.0, 30.0]]),
        jnp.array([0], jnp.int32),
        jnp.array([True]),
        jnp.array([0], jnp.int32),
        jnp.asarray(s["patches"]),
        jnp.asarray(s["patch_boxes"]),
        jnp.asarray(s["patch_classes"]),
        jnp.asarray(s["patch_valid"]),
        jnp.asarray(s["patch_flip"]),
    )
    assert bool(out["valid"][1:][jnp.asarray(s["patch_valid"])].all())


def test_live_pool_ring_capacity():
    pool = LivePool(patch_size=8, capacity_per_cat=3)
    for i in range(5):
        pool.add(0, np.full((8, 8, 4), i, np.float32))
    assert pool.counts()[0] == 3
    with pool._lock:
        vals = [int(v[0, 0, 0]) for v in pool._store[0]]
    assert vals == [2, 3, 4]  # oldest retired
