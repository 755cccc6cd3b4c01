"""Frontend kernel tests: golden comparisons vs OpenCV + invariance checks."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_tpu.ops import brief, fast, frontend, gaussian, hamming, orientation, pyramid


@pytest.fixture(scope="module")
def img():
    """Synthetic textured test image (deterministic)."""
    rng = np.random.default_rng(42)
    base = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    big = cv2.resize(base, (320, 240), interpolation=cv2.INTER_CUBIC)
    big = cv2.GaussianBlur(big, (5, 5), 1.0)
    return np.clip(big, 0, 255).astype(np.uint8)


class TestPyramid:
    def test_resize_matches_opencv(self, img):
        out_h, out_w = 200, 267
        ours = np.asarray(
            pyramid.resize_bilinear(jnp.asarray(img, jnp.float32), out_h, out_w)
        )
        cv = cv2.resize(
            img.astype(np.float32), (out_w, out_h), interpolation=cv2.INTER_LINEAR
        )
        # OpenCV uses fixed-point arithmetic internally; allow ~1 intensity step
        assert np.abs(ours - cv).max() < 1.0
        assert np.abs(ours - cv).mean() < 0.1

    def test_level_sizes(self):
        sizes = pyramid.level_sizes(480, 640, 8, 1.2)
        assert sizes[0] == (480, 640)
        for (h1, w1), (h0, w0) in zip(sizes[1:], sizes[:-1]):
            assert 1.19 < w0 / w1 < 1.21 or (w0 - w1) <= 2

    def test_pyramid_shapes(self, img):
        levels = pyramid.compute_pyramid(jnp.asarray(img), 8, 1.2)
        assert len(levels) == 8
        assert levels[0].shape == img.shape
        assert levels[7].shape[0] < img.shape[0] / 3


class TestGaussian:
    def test_blur_matches_opencv(self, img):
        f = img.astype(np.float32)
        ours = np.asarray(gaussian.blur7x7(jnp.asarray(f)))
        cv = cv2.GaussianBlur(f, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, cv, atol=1e-2)


class TestFAST:
    def test_corners_match_opencv(self, img):
        th = 20
        score = np.asarray(
            fast.nms3x3(fast.fast_score_map(jnp.asarray(img, jnp.float32), th))
        )
        ours = set(zip(*np.nonzero(score > 0)))
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16,
        )
        kps = det.detect(img)
        cv_pts = set((int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps)
        # exclude 3px border + NMS tie-break differences: demand high overlap
        inter = len(ours & cv_pts)
        assert inter / max(len(cv_pts), 1) > 0.85, (len(ours), len(cv_pts), inter)
        assert inter / max(len(ours), 1) > 0.85

    def test_scores_match_opencv(self, img):
        th = 20
        score = np.asarray(
            fast.nms3x3(fast.fast_score_map(jnp.asarray(img, jnp.float32), th))
        )
        det = cv2.FastFeatureDetector_create(threshold=th, nonmaxSuppression=True)
        kps = det.detect(img)
        checked = 0
        for k in kps:
            x, y = int(round(k.pt[0])), int(round(k.pt[1]))
            if score[y, x] > 0:
                assert abs(score[y, x] - k.response) <= 1.0, (k.response, score[y, x])
                checked += 1
        assert checked > 20

    def test_fallback_adds_corners(self, img):
        # low-contrast image: high threshold finds little, fallback kicks in
        flat = (img.astype(np.float32) * 0.15 + 100).astype(np.float32)
        hi_only = np.asarray(fast.nms3x3(fast.fast_score_map(jnp.asarray(flat), 20)))
        both = np.asarray(fast.detect_with_fallback(jnp.asarray(flat), 20, 7, 16))
        assert (both > 0).sum() > (hi_only > 0).sum()

    def test_select_topk_grid_budget_and_spread(self, img):
        score = fast.detect_with_fallback(jnp.asarray(img, jnp.float32), 20, 7, 16)
        xy, resp, valid = fast.select_topk_grid(score, 200, cell=24)
        assert xy.shape == (200, 2)
        nv = int(np.asarray(valid).sum())
        assert nv > 100
        # spatial spread: keypoints should cover at least half the cells
        v = np.asarray(xy)[np.asarray(valid)]
        cells = set(zip(v[:, 0] // 24, v[:, 1] // 24))
        assert len(cells) > nv / 4


class TestOrientation:
    def test_gradient_image_angle(self):
        # horizontal intensity ramp -> centroid to the right -> angle ~ 0
        ramp = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        xy = jnp.array([[32, 32]], jnp.int32)
        ang = np.asarray(
            orientation.ic_angles(jnp.asarray(ramp), xy, jnp.array([True]))
        )
        assert ang[0] < 5 or ang[0] > 355
        # vertical ramp -> angle ~ 90 (y down)
        ang2 = np.asarray(
            orientation.ic_angles(jnp.asarray(ramp.T), xy, jnp.array([True]))
        )
        assert 85 < ang2[0] < 95

    def test_rotation_consistency_with_opencv_orb(self, img):
        """Our IC angle should roughly track OpenCV ORB's angle estimates."""
        orb = cv2.ORB_create(nfeatures=100, nlevels=1, edgeThreshold=19)
        kps = orb.detect(img)
        pts = [(int(round(k.pt[0])), int(round(k.pt[1]))) for k in kps[:50]]
        if not pts:
            pytest.skip("no ORB keypoints")
        xy = jnp.asarray(np.array(pts, np.int32))
        ours = np.asarray(
            orientation.ic_angles(
                jnp.asarray(img, jnp.float32), xy, jnp.ones(len(pts), bool)
            )
        )
        cv_ang = np.array([k.angle for k in kps[:50]])
        diff = np.abs(((ours - cv_ang) + 180) % 360 - 180)
        assert np.median(diff) < 10.0, np.median(diff)


class TestBRIEF:
    def test_descriptor_determinism_and_packing(self, img):
        f = jnp.asarray(img, jnp.float32)
        blurred = gaussian.blur7x7(f)
        xy = jnp.array([[50, 50], [100, 80], [200, 150]], jnp.int32)
        ang = jnp.array([0.0, 45.0, 180.0])
        valid = jnp.ones(3, bool)
        d1 = np.asarray(brief.describe(blurred, xy, ang, valid))
        d2 = np.asarray(brief.describe(blurred, xy, ang, valid))
        assert d1.shape == (3, 8) and d1.dtype == np.uint32
        np.testing.assert_array_equal(d1, d2)
        assert not (d1[0] == d1[1]).all()

    def test_rotation_invariance(self, img):
        """Descriptor at rotated keypoint with rotated angle ~ matches."""
        f = img.astype(np.float32)
        h, w = f.shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), 30, 1.0)
        rot = cv2.warpAffine(f, M, (w, h), flags=cv2.INTER_LINEAR)
        pt = np.array([140.0, 120.0])
        pt_r = M[:, :2] @ pt + M[:, 2]

        b0 = gaussian.blur7x7(jnp.asarray(f))
        b1 = gaussian.blur7x7(jnp.asarray(rot))
        a0 = orientation.ic_angles(
            jnp.asarray(f), jnp.asarray([pt.astype(int)]), jnp.array([True])
        )
        a1 = orientation.ic_angles(
            jnp.asarray(rot), jnp.asarray([pt_r.astype(int)]), jnp.array([True])
        )
        d0 = brief.describe(b0, jnp.asarray([pt.astype(int)]), a0, jnp.array([True]))
        d1 = brief.describe(b1, jnp.asarray([pt_r.astype(int)]), a1, jnp.array([True]))
        dist = int(np.asarray(hamming.distance(d0, d1))[0])
        # the noise texture has unstable orientation; OpenCV's own ORB scores
        # 98 on this exact pair — require parity with OpenCV + margin, and
        # clearly below the ~128 expectation for unrelated descriptors.
        orb = cv2.ORB_create(nlevels=1, edgeThreshold=19)
        _, c0 = orb.compute(img.astype(np.uint8), [cv2.KeyPoint(float(pt[0]), float(pt[1]), 31)])
        _, c1 = orb.compute(rot.astype(np.uint8), [cv2.KeyPoint(float(pt_r[0]), float(pt_r[1]), 31)])
        cv_dist = cv2.norm(c0, c1, cv2.NORM_HAMMING)
        assert dist <= cv_dist + 15, (dist, cv_dist)
        assert dist < 110, dist

    def test_descriptors_match_opencv_orb(self, img):
        """With the verbatim bit_pattern_31_ table, descriptors computed at
        OpenCV's own keypoints/angles must be near-identical to
        cv2.ORB.compute output (ref: src/ORBextractor.cc:103-144).  Small
        drift comes only from the Gaussian blur (OpenCV 7x7 sigma=2 matches
        ours) and tap rounding at the float boundary."""
        orb = cv2.ORB_create(nfeatures=150, nlevels=1, edgeThreshold=31)
        kps = orb.detect(img)
        kps, cv_desc = orb.compute(img, kps)
        assert len(kps) > 30
        xy = np.array([[round(k.pt[0]), round(k.pt[1])] for k in kps], np.int32)
        ang = np.array([k.angle for k in kps], np.float32)
        blurred = gaussian.blur7x7(jnp.asarray(img, jnp.float32))
        ours = np.asarray(brief.describe(
            jnp.asarray(blurred), jnp.asarray(xy), jnp.asarray(ang),
            jnp.ones(len(kps), bool)))
        # cv2 bytes little-endian-viewed as u32 match our packing order
        cv_u32 = np.ascontiguousarray(cv_desc).view("<u4")
        dist = np.asarray(hamming.distance(
            jnp.asarray(ours), jnp.asarray(cv_u32)))
        # near-bit-exact: median 0-4 bits, mean tightly bounded
        assert np.median(dist) <= 4, (np.median(dist), dist[:10])
        assert dist.mean() <= 8, dist.mean()

    def test_random_pair_distance_is_high(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.integers(0, 2**32, (100, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (100, 8), dtype=np.uint32))
        d = np.asarray(hamming.distance(a, b))
        assert 100 < d.mean() < 156  # random 256-bit strings: ~128


class TestHamming:
    def test_distance_matrix_matches_elementwise(self):
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.integers(0, 2**32, (17, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (23, 8), dtype=np.uint32))
        dm = np.asarray(hamming.distance_matrix(a, b))
        for i in [0, 5, 16]:
            for j in [0, 11, 22]:
                d = int(np.asarray(hamming.distance(a[i], b[j])))
                assert dm[i, j] == d

    def test_distance_zero_self(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.integers(0, 2**32, (10, 8), dtype=np.uint32))
        assert (np.asarray(hamming.distance(a, a)) == 0).all()

    def test_masked_argmin_and_ratio(self):
        dist = jnp.array([[5, 2, 9], [1, 1, 1]], jnp.int32)
        mask = jnp.array([[True, True, False], [False, True, True]])
        idx, best, second = hamming.masked_argmin(dist, mask)
        assert list(np.asarray(idx)) == [1, 1]
        assert list(np.asarray(best)) == [2, 1]
        assert list(np.asarray(second)) == [5, 1]

    def test_rotation_histogram_filter(self):
        n = 100
        rng = np.random.default_rng(6)
        aq = jnp.asarray(rng.uniform(0, 360, n).astype(np.float32))
        at = jnp.asarray((np.asarray(aq) - 30.0) % 360.0)  # consistent rot 30
        outlier_t = at.at[:10].set(jnp.asarray(rng.uniform(0, 360, 10), jnp.float32))
        matched = jnp.ones(n, bool)
        keep = np.asarray(
            hamming.rotation_histogram_filter(aq, outlier_t, matched)
        )
        assert keep[10:].mean() > 0.95
        assert keep[:10].mean() < 0.5


class TestExtract:
    def test_full_extraction(self, img):
        feats = frontend.extract(
            jnp.asarray(img), n_features=300, n_levels=4, ini_th=20, min_th=7
        )
        v = np.asarray(feats.valid)
        assert v.sum() > 150
        xy = np.asarray(feats.xy)[v]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < img.shape[1]).all()
        octv = np.asarray(feats.octave)[v]
        assert octv.max() >= 1  # multi-level detection happened
        d = np.asarray(feats.desc)[v]
        assert np.unique(d, axis=0).shape[0] > len(d) * 0.9

    def test_extraction_repeatability_under_shift(self, img):
        """Features should track a small translation of the image."""
        feats0 = frontend.extract(jnp.asarray(img), n_features=200, n_levels=2)
        shifted = np.roll(img, 5, axis=1)
        feats1 = frontend.extract(jnp.asarray(shifted), n_features=200, n_levels=2)
        v0, v1 = np.asarray(feats0.valid), np.asarray(feats1.valid)
        xy0 = np.asarray(feats0.xy)[v0]
        xy1 = np.asarray(feats1.xy)[v1] - np.array([5.0, 0.0])
        # fraction of feats0 with a counterpart within 1px in shifted set
        from scipy.spatial import cKDTree

        tree = cKDTree(xy1)
        dd, _ = tree.query(xy0, k=1)
        interior = (xy0[:, 0] > 30) & (xy0[:, 0] < img.shape[1] - 30)
        assert (dd[interior] < 1.5).mean() > 0.6


class TestStereoPallasKernel:
    def test_sad_kernel_matches_xla(self):
        """stereo_pallas.sad_strips == the XLA gather formulation
        (skipped off-TPU; the kernel needs the Mosaic backend)."""
        import pytest

        from orb_slam2_tpu.ops.frontend import _use_pallas

        if not _use_pallas():
            pytest.skip("pallas TPU kernel requires a TPU backend")
        import jax.numpy as jnp

        from orb_slam2_tpu.ops import orb_pallas, stereo, stereo_pallas

        H, W = 128, 384
        rng = np.random.default_rng(3)
        il = rng.uniform(0, 255, (H, W)).astype(np.float32)
        ir = rng.uniform(0, 255, (H, W)).astype(np.float32)
        N = 64
        lo = stereo._W + stereo._L
        yc = rng.integers(stereo._W, H - stereo._W, N).astype(np.int32)
        xl = rng.integers(lo, W - lo - 1, N).astype(np.int32)
        xr = rng.integers(lo, W - lo - 1, N).astype(np.int32)
        out = np.asarray(stereo_pallas.sad_strips(
            orb_pallas.pad_for_kernel(jnp.asarray(il)),
            orb_pallas.pad_for_kernel(jnp.asarray(ir)),
            jnp.asarray(yc), jnp.asarray(xl), jnp.asarray(xr)))

        dy = np.arange(-stereo._W, stereo._W + 1)
        ref = np.empty((N, 11), np.float32)
        for i in range(N):
            pl_ = il[yc[i] + dy[:, None], xl[i] + dy[None, :]]
            pn = pl_ - pl_[5, 5]
            for s in range(11):
                wr = ir[yc[i] + dy[:, None],
                        xr[i] - 10 + s + (dy + 5)[None, :]]
                ref[i, s] = np.abs(pn - (wr - wr[5, 5])).sum()
        np.testing.assert_allclose(out, ref, atol=0.05)


class TestFastPallasKernel:
    def _images(self):
        rng = np.random.default_rng(11)
        # smooth-ish texture with real corners + a flat region + edges
        img = rng.uniform(0, 255, (200, 300)).astype(np.float32)
        import cv2

        img = cv2.GaussianBlur(img, (5, 5), 1.2)
        img[40:80, 40:90] = 10.0
        img[120:160, 150:260] = 240.0
        odd = rng.uniform(0, 255, (97, 131)).astype(np.float32)  # odd sizes
        return [img, odd]

    def test_fused_kernel_matches_xla_interpret(self):
        """fast_pallas.detect_with_fallback (interpret mode) is exactly
        equal to the XLA formulation inside the detector border."""
        from orb_slam2_tpu.ops import fast, fast_pallas

        for img in self._images():
            ref = np.asarray(
                fast.detect_with_fallback(jnp.asarray(img), 20.0, 7.0, 16))
            out = np.asarray(fast_pallas.detect_with_fallback(
                jnp.asarray(img), 20.0, 7.0, 16, interpret=True))
            assert out.shape == ref.shape
            np.testing.assert_array_equal(out, ref)
            assert (ref > 0).sum() > 20   # the scene must actually fire

    def test_fused_kernel_matches_xla_compiled(self):
        """Compiled Mosaic kernel parity (skipped off-TPU)."""
        import pytest

        from orb_slam2_tpu.ops.frontend import _use_pallas

        if not _use_pallas():
            pytest.skip("pallas TPU kernel requires a TPU backend")
        from orb_slam2_tpu.ops import fast, fast_pallas

        img = self._images()[0]
        ref = np.asarray(
            fast.detect_with_fallback(jnp.asarray(img), 20.0, 7.0, 16))
        out = np.asarray(fast_pallas.detect_with_fallback(
            jnp.asarray(img), 20.0, 7.0, 16))
        np.testing.assert_array_equal(out, ref)
