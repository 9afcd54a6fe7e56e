import numpy as np
import pytest

from g4splat_tpu.io import colmap as C


def make_model(n_cams=2, n_imgs=3, n_pts=50, seed=0):
    rng = np.random.RandomState(seed)
    cams = {
        i + 1: C.ColmapCamera(
            i + 1, "PINHOLE", 640, 480,
            np.array([500.0 + i, 505.0, 320.0, 240.0]),
        )
        for i in range(n_cams)
    }
    images = {}
    for i in range(n_imgs):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        n2d = rng.randint(0, 5)
        images[i + 1] = C.ColmapImage(
            i + 1, q, rng.randn(3), (i % n_cams) + 1, f"frame_{i:05d}.jpg",
            rng.rand(n2d, 2) * 640,
            rng.randint(-1, n_pts, n2d).astype(np.int64),
        )
    pts = {}
    for i in range(n_pts):
        tl = rng.randint(1, 4)
        pts[i] = C.ColmapPoint3D(
            i, rng.randn(3), rng.randint(0, 256, 3).astype(np.uint8),
            float(rng.rand()), rng.randint(1, n_imgs + 1, tl).astype(np.int32),
            rng.randint(0, 5, tl).astype(np.int32),
        )
    return cams, images, pts


def assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert set(ca) == set(cb) and set(ia) == set(ib) and set(pa) == set(pb)
    for k in ca:
        assert ca[k].model == cb[k].model
        assert ca[k].width == cb[k].width
        np.testing.assert_allclose(ca[k].params, cb[k].params, rtol=1e-12)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec, rtol=1e-12)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec, rtol=1e-12)
        assert ia[k].name == ib[k].name
        assert ia[k].camera_id == ib[k].camera_id
        np.testing.assert_allclose(ia[k].xys, ib[k].xys, atol=1e-9)
        np.testing.assert_array_equal(ia[k].point3D_ids, ib[k].point3D_ids)
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz, rtol=1e-12)
        np.testing.assert_array_equal(pa[k].rgb, pb[k].rgb)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)


class TestColmapIO:
    def test_binary_roundtrip(self, tmp_path):
        model = make_model()
        C.write_model(*model, str(tmp_path), binary=True, text=False)
        back = C.read_model(str(tmp_path))
        assert_models_equal(model, back)

    def test_text_roundtrip(self, tmp_path):
        model = make_model()
        C.write_model(*model, str(tmp_path), binary=False, text=True)
        back = C.read_model(str(tmp_path))
        assert_models_equal(model, back)

    def test_binary_matches_text(self, tmp_path):
        model = make_model(seed=3)
        C.write_model(*model, str(tmp_path))
        bin_model = (
            C.read_cameras_binary(str(tmp_path / "cameras.bin")),
            C.read_images_binary(str(tmp_path / "images.bin")),
            C.read_points3D_binary(str(tmp_path / "points3D.bin")),
        )
        txt_model = (
            C.read_cameras_text(str(tmp_path / "cameras.txt")),
            C.read_images_text(str(tmp_path / "images.txt")),
            C.read_points3D_text(str(tmp_path / "points3D.txt")),
        )
        assert_models_equal(bin_model, txt_model)

    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = C._qvec2rotmat(q)
            q2 = C.rotmat2qvec(R)
            np.testing.assert_allclose(q2, q, atol=1e-10)

    def test_to_framework_cameras(self, tmp_path):
        import jax.numpy as jnp

        model = make_model()
        fw = C.to_framework_cameras(model[0], model[1])
        assert len(fw) == 3
        name, cam = fw[0]
        assert name == "frame_00000.jpg"
        assert cam.width == 640 and cam.height == 480
        # w2c rotation must be orthonormal
        R = np.asarray(cam.w2c)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestAsyncImageIO:
    def test_async_write_flush_roundtrip(self, tmp_path):
        import numpy as np

        from g4splat_tpu.io.images import (
            flush_io,
            load_depth_tiff,
            load_image,
            save_depth_tiff_async,
            save_image_async,
            save_npy_async,
        )

        rng = np.random.RandomState(0)
        img = rng.rand(24, 32, 3).astype(np.float32)
        dep = (rng.rand(24, 32) * 5).astype(np.float32)
        arr = rng.randn(7, 3).astype(np.float32)
        img0, dep0, arr0 = img.copy(), dep.copy(), arr.copy()
        save_image_async(str(tmp_path / "a.png"), img)
        save_depth_tiff_async(str(tmp_path / "d.tiff"), dep)
        save_npy_async(str(tmp_path / "n.npy"), arr)
        # Mutating the caller's buffers after scheduling must not corrupt
        # the writes (the async helpers convert/copy synchronously).
        img[:] = 0
        dep[:] = 0
        arr[:] = 0
        flush_io()
        np.testing.assert_allclose(load_image(str(tmp_path / "a.png")), img0,
                                   atol=1.0 / 255)
        np.testing.assert_allclose(load_depth_tiff(str(tmp_path / "d.tiff")),
                                   dep0)
        np.testing.assert_allclose(np.load(str(tmp_path / "n.npy")), arr0)

    def test_flush_reraises_write_error(self, tmp_path):
        import numpy as np
        import pytest

        from g4splat_tpu.io.images import flush_io, save_npy_async

        save_npy_async(str(tmp_path / "nodir" / "x.npy"), np.zeros(3))
        with pytest.raises(Exception):
            flush_io()
        flush_io()  # queue drained; second flush is a no-op
