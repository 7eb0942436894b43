"""Threaded prefetch loader: determinism, concurrency, bucket-sampler and
device-prefetch composition."""

import time

import numpy as np
import pytest

from videocof_tpu.data.loader import PrefetchLoader, device_prefetch


class SlowDataset:
    """Records access order; simulates host decode latency (sleep releases
    the GIL like the C++ runtime decoder does)."""

    def __init__(self, n=16, delay=0.02):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        return {"idx": i, "data": np.full((4,), i, np.float32)}


def test_loader_deterministic_order_any_thread_count():
    ds = SlowDataset()
    ref = [[s["idx"] for s in b]
           for b in PrefetchLoader(ds, batch_size=4, seed=3, num_threads=1,
                                   epochs=1)]
    for t in (2, 4):
        got = [[s["idx"] for s in b]
               for b in PrefetchLoader(ds, batch_size=4, seed=3,
                                       num_threads=t, epochs=1)]
        assert got == ref
    assert len(ref) == 4
    assert sorted(i for b in ref for i in b) == list(range(16))


def test_loader_threads_overlap_decode():
    ds = SlowDataset(n=12, delay=0.05)
    t0 = time.time()
    list(PrefetchLoader(ds, batch_size=4, num_threads=4, epochs=1))
    parallel = time.time() - t0
    # serial cost would be 12*0.05 = 0.6s; 4 threads should beat 0.45s
    assert parallel < 0.45, parallel


def test_loader_epochs_reshuffle_and_infinite():
    ds = SlowDataset(n=8, delay=0.0)
    batches = [[s["idx"] for s in b]
               for b in PrefetchLoader(ds, batch_size=4, seed=0, epochs=2)]
    assert len(batches) == 4
    e1 = [i for b in batches[:2] for i in b]
    e2 = [i for b in batches[2:] for i in b]
    assert sorted(e1) == sorted(e2) == list(range(8))
    assert e1 != e2  # per-epoch reshuffle
    # infinite mode keeps producing
    it = iter(PrefetchLoader(ds, batch_size=4, seed=0, epochs=None))
    for _ in range(7):
        assert len(next(it)) == 4


def test_loader_with_bucket_sampler():
    from videocof_tpu.data.buckets import AspectRatioBatchSampler
    shapes = [(512, 512)] * 6 + [(320, 768)] * 6
    ds = SlowDataset(n=12, delay=0.0)
    sampler = AspectRatioBatchSampler(shapes, batch_size=3, seed=1)
    seen = []
    for batch in PrefetchLoader(ds, batch_sampler=sampler, epochs=1):
        idxs = [s["idx"] for s in batch]
        seen.extend(idxs)
        # same-aspect batches only
        assert len({shapes[i] for i in idxs}) == 1
    assert sorted(seen) == list(range(12))


def test_sample_iter_and_device_prefetch():
    ds = SlowDataset(n=8, delay=0.0)
    loader = PrefetchLoader(ds, batch_size=2, seed=5, num_threads=2,
                            epochs=1)
    singles = [s["idx"] for s in device_prefetch(loader.sample_iter(),
                                                 size=2)]
    assert sorted(singles) == list(range(8))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = device_prefetch(boom(), size=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_loader_feeds_trainer_end_to_end():
    """PrefetchLoader -> device_prefetch -> CoFTrainer: the full training
    input path (threaded decode look-ahead in front of the device step)."""
    import jax
    from videocof_tpu.configs import T5_TINY, VAE_TINY, WAN_TINY
    from videocof_tpu.data.tokenizer import WanTokenizer
    from videocof_tpu.models import t5_encoder, wan_dit, wan_vae
    from videocof_tpu.training.trainer import CoFTrainer, TrainerConfig

    class TripletDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {
                "pixel_src": rng.uniform(-1, 1, (3, 9, 32, 32)
                                         ).astype(np.float32),
                "pixel_ground": rng.uniform(-1, 1, (3, 4, 32, 32)
                                            ).astype(np.float32),
                "pixel_tgt": rng.uniform(-1, 1, (3, 9, 32, 32)
                                         ).astype(np.float32),
                "text": f"triplet {i}",
            }

    vcfg = VAE_TINY
    dcfg = WAN_TINY.replace(in_dim=vcfg.z_dim, out_dim=vcfg.z_dim,
                            text_dim=T5_TINY.dim)
    tcfg = TrainerConfig(height=32, width=32, source_frames=9,
                         target_frames=9, reasoning_frames=4, batch_size=2,
                         total_steps=2, learning_rate=1e-4, log_every=1)
    trainer = CoFTrainer(
        wan_dit.init_wan_dit(jax.random.PRNGKey(0), dcfg), dcfg,
        wan_vae.init_wan_vae(jax.random.PRNGKey(1), vcfg), vcfg,
        t5_encoder.init_t5_encoder(jax.random.PRNGKey(2), T5_TINY), T5_TINY,
        WanTokenizer(vocab_size=T5_TINY.vocab), tcfg)
    loader = PrefetchLoader(TripletDS(), batch_size=2, num_threads=2,
                            epochs=None)
    state = trainer.train(device_prefetch(loader.sample_iter(), size=2),
                          total_steps=2)
    assert int(jax.device_get(state.step)) == 2
