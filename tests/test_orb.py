"""Unit tests for the ORB front end (ops.hamming, ops.orb)."""
import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.config import OrbConfig
from multiagent_orb_slam2_tpu.ops import hamming, orb


class TestHamming:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, size=(16, 256)), dtype=jnp.uint32)
        packed = hamming.pack_bits(bits)
        assert packed.shape == (16, 8) and packed.dtype == jnp.uint32
        np.testing.assert_array_equal(hamming.unpack_bits(packed), bits)

    def test_hamming_matches_numpy(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2**32, size=(8, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=(12, 8), dtype=np.uint32))
        d = np.asarray(hamming.hamming_matrix(a, b))
        an = np.unpackbits(np.asarray(a).view(np.uint8), axis=-1)
        bn = np.unpackbits(np.asarray(b).view(np.uint8), axis=-1)
        expected = (an[:, None, :] != bn[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, expected)

    def test_mxu_path_matches_vpu_path(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.integers(0, 2**32, size=(32, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=(48, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(hamming.hamming_matrix_mxu(a, b)),
            np.asarray(hamming.hamming_matrix(a, b)))

    def test_chunked_matches_dense(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=(100, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(hamming.hamming_matrix_chunked(a, b, chunk=32)),
            np.asarray(hamming.hamming_matrix(a, b)))

    def test_masked_argmin(self):
        d = jnp.asarray([[5, 3, 9, 1], [2, 8, 2, 7]])
        mask = jnp.asarray([[True, True, True, False], [True, True, True, True]])
        idx, best, second = hamming.masked_argmin(d, mask)
        np.testing.assert_array_equal(idx, [1, 0])
        np.testing.assert_array_equal(best, [3, 2])
        np.testing.assert_array_equal(second, [5, 2])


def checkerboard(h=240, w=320, sq=24, seed=0):
    """Synthetic corner-rich image: random-intensity checkerboard."""
    rng = np.random.default_rng(seed)
    ny, nx = h // sq + 1, w // sq + 1
    vals = rng.uniform(30, 220, size=(ny, nx))
    img = np.kron(vals, np.ones((sq, sq)))[:h, :w]
    return jnp.asarray(img, dtype=jnp.float32)


class TestFast:
    def test_square_corners_detected(self):
        img = np.full((64, 64), 20.0, np.float32)
        img[20:40, 20:40] = 200.0
        score = np.asarray(orb.fast_score(jnp.asarray(img)))
        # corners of the square should have high score, flat areas ~ none
        assert score[20, 20] > 50
        assert score[10, 10] <= 0
        assert score[30, 30] <= 0  # interior is flat

    def test_detect_level_spatial_balance(self):
        img = checkerboard()
        cfg = OrbConfig(n_features=200)
        xy, score, valid = orb.detect_level(img, 100, cfg, border=19)
        xy, valid = np.asarray(xy), np.asarray(valid)
        assert valid.sum() > 50
        # keypoints spread over many cells
        cells = set(map(tuple, xy[valid] // cfg.cell_size))
        assert len(cells) > 20
        # scores positive for valid
        assert np.all(np.asarray(score)[valid] > 0)


class TestExtract:
    CFG = OrbConfig(n_features=300, n_levels=4)

    def test_extract_shapes_and_validity(self):
        img = checkerboard()
        kp = orb.extract(img, self.CFG)
        n = sum(self.CFG.level_budgets)
        assert kp.xy.shape == (n, 2)
        assert kp.desc.shape == (n, 8)
        assert int(kp.n) > 100
        v = np.asarray(kp.valid)
        xy = np.asarray(kp.xy)[v]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240

    def test_determinism(self):
        img = checkerboard(seed=1)
        k1 = orb.extract(img, self.CFG)
        k2 = orb.extract(img, self.CFG)
        np.testing.assert_array_equal(k1.desc, k2.desc)
        np.testing.assert_array_equal(k1.xy, k2.xy)

    def test_descriptor_match_under_shift(self):
        """Shifting the image must yield shifted keypoints whose descriptors
        match (small Hamming distance) — the invariance tracking relies on."""
        base = checkerboard(seed=2)
        shifted = jnp.roll(base, (7, 13), axis=(0, 1))
        k1 = orb.extract(base, self.CFG)
        k2 = orb.extract(shifted, self.CFG)
        v1, v2 = np.asarray(k1.valid), np.asarray(k2.valid)
        xy1 = np.asarray(k1.xy)[v1]
        xy2 = np.asarray(k2.xy)[v2] - np.array([13.0, 7.0])
        d1 = np.asarray(k1.desc)[v1]
        d2 = np.asarray(k2.desc)[v2]
        lvl1 = np.asarray(k1.level)[v1]
        lvl2 = np.asarray(k2.level)[v2]
        # pair keypoints by position (level 0 only, away from borders)
        sel1 = (lvl1 == 0) & (xy1[:, 0] > 40) & (xy1[:, 0] < 280) \
            & (xy1[:, 1] > 40) & (xy1[:, 1] < 200)
        matched, close = 0, 0
        dist = np.asarray(hamming.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2)))
        for i in np.where(sel1)[0]:
            dpos = np.linalg.norm(xy2 - xy1[i], axis=-1)
            j = int(np.argmin(np.where(lvl2 == 0, dpos, 1e9)))
            if dpos[j] < 1.5:
                matched += 1
                if dist[i, j] < 60:
                    close += 1
        assert matched > 20
        assert close / max(matched, 1) > 0.8
