"""Samplers, transforms, loader sharding — host-side, no jit."""

import numpy as np

from egovlpv2_tpu.data.loader import DataLoader, HostShardSampler, default_collate
from egovlpv2_tpu.data.sampling import (
    sample_frames,
    sample_frames_clips,
    sample_frames_start_end,
)
from egovlpv2_tpu.data.transforms import (
    center_crop,
    eval_transform,
    normalize,
    resize_short_side,
    train_transform,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def test_sample_frames_uniform_midpoints():
    # vlen 100, 4 frames -> intervals [0,25),[25,50),[50,75),[75,100)
    idxs = sample_frames(4, 100, sample="uniform")
    assert list(map(int, idxs)) == [12, 37, 62, 87]  # (lo + hi) // 2, hi = next-1


def test_sample_frames_rand_within_intervals():
    rng = np.random.default_rng(0)
    for _ in range(10):
        idxs = sample_frames(4, 100, sample="rand", rng=rng)
        pts = np.linspace(0, 100, 5).astype(int)
        for i, idx in enumerate(idxs):
            assert pts[i] <= idx < pts[i + 1]


def test_sample_frames_fewer_than_requested():
    idxs = sample_frames(8, 3, sample="uniform")
    assert len(idxs) == 3  # acc_samples = min(num_frames, vlen)


def test_sample_start_end():
    idxs = sample_frames_start_end(4, 30, 90, sample="uniform")
    assert len(idxs) == 4
    assert all(30 <= i < 90 for i in idxs)


def test_sample_clips_midpoints():
    idxs = sample_frames_clips(0, 100, 120, 4)
    assert len(idxs) == 4
    assert all(0 <= i < 100 for i in idxs)


def test_resize_and_crop_shapes():
    clip = np.random.default_rng(0).random((2, 120, 160, 3)).astype(np.float32)
    r = resize_short_side(clip, 64)
    assert r.shape == (2, 64, 85, 3)  # short side 64, aspect kept
    c = center_crop(r, 64)
    assert c.shape == (2, 64, 64, 3)


def test_eval_transform_is_deterministic_and_normalized():
    clip = np.full((2, 100, 140, 3), 0.5, np.float32)
    a = eval_transform(clip, size=32, intermediate=48)
    b = eval_transform(clip, size=32, intermediate=48)
    np.testing.assert_array_equal(a, b)
    expected = (0.5 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(a[0, 0, 0], expected, rtol=1e-5)


def test_train_transform_shape_and_flip():
    rng = np.random.default_rng(0)
    clip = np.random.default_rng(1).random((3, 100, 140, 3)).astype(np.float32)
    out = train_transform(clip, rng, size=32)
    assert out.shape == (3, 32, 32, 3)
    assert np.isfinite(out).all()


def test_host_shard_sampler_partitions():
    shards = [HostShardSampler(103, num_hosts=4, host_id=h, seed=3).indices(7)
              for h in range(4)]
    lens = {len(s) for s in shards}
    assert len(lens) == 1  # equal length (padded)
    all_idx = np.concatenate(shards)
    assert set(all_idx.tolist()) == set(range(103))
    # different epoch -> different permutation
    other = HostShardSampler(103, num_hosts=4, host_id=0, seed=3).indices(8)
    assert not np.array_equal(shards[0], other)


def test_loader_batches():
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32), "label": i}

    dl = DataLoader(Toy(), batch_size=4, num_workers=1)
    batches = list(dl.epoch(0))
    assert len(batches) == 2  # drop_last
    assert batches[0]["x"].shape == (4, 2)
    assert batches[0]["label"].shape == (4,)


def test_loader_preserves_uint8_batches():
    """device_norm feeds collate as uint8 all the way to the device batch
    (dtype widening in the loader would silently re-inflate the transfer)."""
    class ToyU8:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"video": np.full((2, 4, 4, 3), i, np.uint8), "idx": i}

    dl = DataLoader(ToyU8(), batch_size=4, num_workers=1)
    batch = next(iter(dl.epoch(0)))
    assert batch["video"].dtype == np.uint8
    assert batch["video"].shape == (4, 2, 4, 4, 3)


def test_device_prefetch_orders_counts_and_raises():
    """device_prefetch (the H2D feeder thread, VERDICT r4 task 4): same
    stream a sequential map would produce, puts issued AHEAD of
    consumption, exceptions re-raised at the consumer, depth=0 passthrough,
    and an abandoned generator releases its feeder."""
    import time

    from egovlpv2_tpu.data.loader import device_prefetch

    put_log = []

    def put(b):
        put_log.append(b)
        return b * 10

    out = list(device_prefetch(iter(range(6)), put, depth=2))
    assert out == [0, 10, 20, 30, 40, 50]
    assert put_log == list(range(6))

    # puts run ahead: after pulling ONE item, the feeder has already put
    # at least depth more (poll — the feeder is a thread)
    put_log.clear()
    gen = device_prefetch(iter(range(6)), put, depth=2)
    assert next(gen) == 0
    for _ in range(50):
        if len(put_log) >= 3:
            break
        time.sleep(0.02)
    assert len(put_log) >= 3
    gen.close()  # abandon: feeder must unblock (daemon thread exits)

    # depth=0 is the inline path
    put_log.clear()
    gen0 = device_prefetch(iter(range(3)), put, depth=0)
    assert next(gen0) == 0 and put_log == [0]

    # exceptions from put_fn surface at the consumer
    def bad(b):
        raise ValueError("boom")

    try:
        list(device_prefetch(iter(range(2)), bad, depth=2))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_train_transform_uint8_roundtrip():
    """uint8 geometric output matches the f32 pipeline up to 8-bit
    quantization (same rng -> same crop/flip)."""
    from egovlpv2_tpu.data import transforms

    rs = np.random.RandomState(5)
    clip = rs.rand(3, 40, 40, 3).astype(np.float32)
    f = transforms.train_transform(clip, np.random.default_rng(9), size=32,
                                   normalize=False)
    u = transforms.train_transform_uint8(clip, np.random.default_rng(9),
                                         size=32)
    assert u.dtype == np.uint8
    np.testing.assert_allclose(u.astype(np.float32) / 255.0, f, atol=1 / 255.0)


def test_round_robin_loader_alternates_and_drains():
    """BaseMultiDataLoader parity (base_data_loader.py:142): batches
    alternate across loaders per step and all loaders drain fully."""
    from egovlpv2_tpu.data.loader import RoundRobinLoader

    class Fake:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def epoch(self, epoch=0):
            for i in range(self.n):
                yield {"tag": self.tag, "i": i}

    rr = RoundRobinLoader([Fake("a", 3), Fake("b", 1)])
    out = list(rr.epoch(0))
    assert len(out) == len(rr) == 4
    assert [b["tag"] for b in out[:2]] == ["a", "b"]  # alternation
    assert [b["i"] for b in out if b["tag"] == "a"] == [0, 1, 2]  # drained


def test_profile_trace_writes_trace(tmp_path):
    """profile_trace captures a device trace (usable on CPU too)."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from egovlpv2_tpu.utils.logging import profile_trace

    with profile_trace(str(tmp_path)):
        float(jnp.sum(jnp.ones((8, 8))))
    assert glob.glob(os.path.join(str(tmp_path), "**", "*.pb*"),
                     recursive=True) or os.listdir(str(tmp_path))
