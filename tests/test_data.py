"""Data layer tests: datasets, pipeline iteration, normalize, AutoAugment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvit_tpu.data import (
    load_dataset,
    make_synthetic,
    make_epoch_iterator,
    device_prefetch,
    normalize,
    preprocess,
)
from nvit_tpu.data.autoaugment import (
    CIFAR10_POLICY,
    IMAGENET_POLICY,
    _autocontrast,
    _brightness,
    _equalize,
    _invert,
    _posterize,
    _rotate,
    _solarize,
    _translate_x,
    auto_augment_batch,
)


class TestSynthetic:
    def test_shapes_and_determinism(self):
        a = make_synthetic(num_examples=64, image_size=16, num_classes=7)
        b = make_synthetic(num_examples=64, image_size=16, num_classes=7)
        assert a.images.shape == (64, 3, 16, 16)
        assert a.images.dtype == np.uint8
        np.testing.assert_array_equal(a.images, b.images)
        assert a.labels.max() < 7

    def test_load_dataset_dispatch(self):
        ds = load_dataset("synthetic", "/nonexistent", train=False, image_size=8, num_classes=3)
        assert ds.num_classes == 3
        with pytest.raises(FileNotFoundError):
            load_dataset("cifar10", "/nonexistent")
        with pytest.raises(ValueError):
            load_dataset("mnist", "/nonexistent")


class TestPipeline:
    def test_epoch_iteration_drop_last(self):
        ds = make_synthetic(num_examples=70, image_size=8, num_classes=4)
        batches = list(make_epoch_iterator(ds, batch_size=32, epoch=0, seed=1, shuffle=True))
        assert len(batches) == 2  # 70 // 32, drop_last
        assert batches[0][0].shape == (32, 3, 8, 8)

    def test_shuffle_differs_by_epoch_but_deterministic(self):
        ds = make_synthetic(num_examples=64, image_size=8, num_classes=4)
        e0a = next(iter(make_epoch_iterator(ds, batch_size=16, epoch=0, seed=1, shuffle=True)))
        e0b = next(iter(make_epoch_iterator(ds, batch_size=16, epoch=0, seed=1, shuffle=True)))
        e1 = next(iter(make_epoch_iterator(ds, batch_size=16, epoch=1, seed=1, shuffle=True)))
        np.testing.assert_array_equal(e0a[1], e0b[1])
        assert not np.array_equal(e0a[1], e1[1])

    def test_start_batch_resumes_mid_epoch_exactly(self):
        """start_batch=k yields exactly the tail of the same epoch order —
        the mid-epoch resume contract (trainer skips already-trained
        batches instead of replaying the epoch)."""
        ds = make_synthetic(num_examples=70, image_size=8, num_classes=4)
        full = list(make_epoch_iterator(ds, batch_size=16, epoch=2, seed=1, shuffle=True))
        tail = list(
            make_epoch_iterator(ds, batch_size=16, epoch=2, seed=1, shuffle=True, start_batch=2)
        )
        assert len(tail) == len(full) - 2
        for (ia, la), (ib, lb) in zip(tail, full[2:]):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)
        # past the end → empty, not an error
        assert list(
            make_epoch_iterator(ds, batch_size=16, epoch=2, seed=1, shuffle=True, start_batch=99)
        ) == []

    def test_device_prefetch_yields_all(self):
        ds = make_synthetic(num_examples=64, image_size=8, num_classes=4)
        it = make_epoch_iterator(ds, batch_size=16, epoch=0, seed=1, shuffle=False)
        out = list(device_prefetch(it, size=2))
        assert len(out) == 4
        assert isinstance(out[0][0], jax.Array)
        np.testing.assert_array_equal(np.asarray(out[0][1]), ds.labels[:16])

    def test_device_prefetch_reraises_producer_errors(self):
        """A decode failure mid-epoch must surface, not look like a clean
        end-of-epoch (round-1 advisor/VERDICT finding)."""

        def broken_iter():
            ds = make_synthetic(num_examples=32, image_size=8, num_classes=4)
            yield ds.images[:16], ds.labels[:16]
            raise RuntimeError("corrupt shard")

        it = device_prefetch(broken_iter(), size=2)
        next(it)  # first batch is fine
        with pytest.raises(RuntimeError, match="corrupt shard"):
            list(it)

    def test_device_prefetch_early_abandon_releases_producer(self):
        """Abandoning the generator early (the trainer's capped eval passes do
        this every eval) must release the producer thread and close the source
        iterator — each leak pins a thread plus size+1 device batches."""
        import threading
        import time as _time

        closed = []

        def source():
            try:
                ds = make_synthetic(num_examples=256, image_size=8, num_classes=4)
                for i in range(16):
                    yield ds.images[:16], ds.labels[:16]
            finally:
                closed.append(True)

        g = device_prefetch(source(), size=2)
        next(g)
        g.close()  # early abandonment (== break in a for loop + GC)
        deadline = _time.time() + 10
        while _time.time() < deadline:
            if not any(t.name == "nvit-prefetch" and t.is_alive() for t in threading.enumerate()):
                break
            _time.sleep(0.05)
        assert not any(
            t.name == "nvit-prefetch" and t.is_alive() for t in threading.enumerate()
        ), "producer thread leaked after consumer abandoned the iterator"
        assert closed, "source iterator was not closed"


class TestNormalize:
    def test_range(self):
        u8 = jnp.asarray(np.array([[0, 255, 128]], dtype=np.uint8))
        out = np.asarray(normalize(u8))
        np.testing.assert_allclose(out, [[-1.0, 1.0, 128 * 2 / 255 - 1]], atol=1e-6)

    def test_preprocess_eval_is_normalize_only(self):
        imgs = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 3, 8, 8), dtype=np.uint8))
        np.testing.assert_array_equal(
            np.asarray(preprocess(imgs, train=False)), np.asarray(normalize(imgs))
        )


class TestAutoAugmentOps:
    img = jnp.asarray(np.random.RandomState(0).randint(0, 256, (3, 16, 16)).astype(np.float32))

    def test_invert(self):
        np.testing.assert_allclose(np.asarray(_invert(self.img, 0.0)), 255.0 - np.asarray(self.img))

    def test_solarize(self):
        out = np.asarray(_solarize(self.img, 128.0))
        src = np.asarray(self.img)
        np.testing.assert_allclose(out[src >= 128], 255 - src[src >= 128])
        np.testing.assert_allclose(out[src < 128], src[src < 128])

    def test_posterize_bits(self):
        out = np.asarray(_posterize(self.img, 4.0))
        assert np.all(out % 16 == 0)  # only top 4 bits survive

    def test_brightness_zero_is_identity(self):
        np.testing.assert_allclose(np.asarray(_brightness(self.img, 0.0)), np.asarray(self.img))

    def test_brightness_minus_one_is_black(self):
        np.testing.assert_allclose(np.asarray(_brightness(self.img, -1.0)), 0.0)

    def test_autocontrast_full_range(self):
        out = np.asarray(_autocontrast(self.img, 0.0))
        assert out.min() == pytest.approx(0.0, abs=1e-3)
        assert out.max() == pytest.approx(255.0, abs=1e-3)

    def test_equalize_flattens_histogram(self):
        # strongly skewed image becomes more uniform
        skewed = jnp.asarray((np.random.RandomState(1).rand(3, 32, 32) ** 3 * 255).astype(np.float32))
        out = np.asarray(_equalize(skewed, 0.0))
        assert out.std() > np.asarray(skewed).std() * 1.05

    def test_equalize_uniform_is_stable(self):
        flat = jnp.full((3, 8, 8), 100.0)
        out = np.asarray(_equalize(flat, 0.0))
        # single-valued histogram → step==0 → unchanged (PIL convention)
        np.testing.assert_allclose(out, 100.0)

    def test_translate_shifts(self):
        img = jnp.zeros((1, 8, 8)).at[:, :, 2].set(255.0)
        out = np.asarray(_translate_x(img, 2.0))
        np.testing.assert_allclose(out[0, :, 4], 255.0)
        np.testing.assert_allclose(out[0, :, 2], 0.0)

    def test_rotate_90_moves_mass(self):
        img = jnp.zeros((1, 9, 9)).at[:, 0, :].set(255.0)
        out = np.asarray(_rotate(img, 90.0))
        assert out[0, :, -1].sum() > 0.9 * 9 * 255  # top row → right column


class TestAutoAugmentBatch:
    def test_batch_shapes_dtype_and_determinism(self):
        imgs = jnp.asarray(np.random.RandomState(2).randint(0, 256, (4, 3, 16, 16), dtype=np.uint8))
        key = jax.random.PRNGKey(0)
        a = auto_augment_batch(imgs, key, dataset="cifar10")
        b = auto_augment_batch(imgs, key, dataset="cifar10")
        assert a.shape == imgs.shape and a.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_different_keys_differ(self):
        imgs = jnp.asarray(np.random.RandomState(2).randint(0, 256, (4, 3, 16, 16), dtype=np.uint8))
        a = auto_augment_batch(imgs, jax.random.PRNGKey(0))
        b = auto_augment_batch(imgs, jax.random.PRNGKey(1))
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_imagenet_policy(self):
        imgs = jnp.asarray(np.random.RandomState(3).randint(0, 256, (2, 3, 16, 16), dtype=np.uint8))
        out = auto_augment_batch(imgs, jax.random.PRNGKey(0), dataset="imagenet")
        assert out.shape == imgs.shape

    def test_policies_are_25x2(self):
        assert len(CIFAR10_POLICY) == 25 and len(IMAGENET_POLICY) == 25
        assert all(len(sp) == 2 for sp in CIFAR10_POLICY)


class TestAutoAugmentOpSweep:
    def test_every_op_preserves_contract_at_max_magnitude(self):
        """Property: each of the 15 AA ops, forced (p=1) at the strongest
        magnitude bin, keeps dtype uint8, shape, and the 0..255 range — and
        every non-identity op actually changes a structured test image."""
        import jax

        from nvit_tpu.data.autoaugment import _NAME_TO_OP, _augment_one
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (3, 16, 16), dtype=np.uint8)
        for name, op_id in _NAME_TO_OP.items():
            ops = jnp.array([[op_id, _NAME_TO_OP["identity"]]], jnp.int32)
            probs = jnp.array([[1.0, 0.0]], jnp.float32)
            mags = jnp.array([[9, 0]], jnp.int32)
            out = np.asarray(
                _augment_one(jnp.asarray(img), jax.random.PRNGKey(3), ops, probs, mags, 16)
            )
            assert out.dtype == np.uint8, name
            assert out.shape == img.shape, name
            # uint8 can't leave 0..255; the real contract is no wrap-around
            # garbage: intermediate float math must saturate, not overflow.
            # Saturation shows up as values still spanning a sane range.
            assert out.min() >= 0 and out.max() <= 255, name
            if name != "identity":
                assert not np.array_equal(out, img), f"{name} was a no-op at max magnitude"
            else:
                assert np.array_equal(out, img)
