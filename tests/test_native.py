import numpy as np
import pytest

from orb_slam2_e_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native build unavailable")
    return l


def test_delaunay_grid(lib):
    xs, ys = np.meshgrid(np.linspace(0, 1, 5), np.linspace(0, 1, 5))
    pts = np.stack([xs.ravel(), ys.ravel()], 1) \
        + np.random.RandomState(0).randn(25, 2) * 1e-3
    tris = native.delaunay(pts)
    assert tris is not None
    # Euler: for a triangulated convex-ish point set, T ~ 2n - 2 - b
    assert 20 <= len(tris) <= 50
    assert tris.min() >= 0 and tris.max() < 25
    # all triangles CCW with positive area
    p = pts[tris]
    area = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) \
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
    assert (area > 0).all()


def test_delaunay_matches_scipy_triangle_count(lib):
    rng = np.random.RandomState(1)
    pts = rng.rand(80, 2).astype(np.float32)
    ours = native.delaunay(pts)
    from scipy.spatial import Delaunay
    ref = Delaunay(pts).simplices
    assert ours is not None
    assert abs(len(ours) - len(ref)) <= 2  # boundary degeneracies only


def test_delaunay_empty_circumcircle(lib):
    """Core Delaunay property: no point inside any triangle's circumcircle."""
    rng = np.random.RandomState(2)
    pts = rng.rand(40, 2).astype(np.float64)
    tris = native.delaunay(pts)
    for t in tris[:50]:
        a, b, c = pts[t]
        # circumcenter
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if abs(d) < 1e-12:
            continue
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        r = np.hypot(*(a - [ux, uy]))
        dists = np.hypot(pts[:, 0] - ux, pts[:, 1] - uy)
        inside = dists < r - 1e-9
        inside[t] = False
        assert not inside.any()


def test_knn(lib):
    rng = np.random.RandomState(3)
    pts = rng.rand(200, 3).astype(np.float32)
    q = pts[:10]
    idx = native.knn(pts, q, k=5, cell=0.2)
    assert idx.shape == (10, 5)
    # nearest neighbor of a point in the set is itself
    assert (idx[:, 0] == np.arange(10)).all()
    # verify against brute force
    for i in range(10):
        d = ((pts - q[i]) ** 2).sum(1)
        brute = set(np.argsort(d)[:5])
        assert len(brute & set(idx[i])) >= 4


def test_native_imageio_roundtrip(tmp_path):
    """libpng decode: gray8 exact, rgb->gray BT.601, u16 depth exact,
    prefetcher ordered."""
    np_rng = np.random.RandomState(7)
    from PIL import Image
    img = np_rng.randint(0, 255, (64, 96)).astype(np.uint8)
    p_gray = tmp_path / "g.png"
    Image.fromarray(img).save(p_gray)
    d16 = np_rng.randint(0, 60000, (64, 96)).astype(np.uint16)
    p_d16 = tmp_path / "d.png"
    Image.fromarray(d16).save(p_d16)

    from orb_slam2_e_tpu import native
    if native.get_io_lib() is None:
        import pytest
        pytest.skip("native io unavailable")
    g = native.read_gray8(p_gray)
    assert np.array_equal(g, img)
    d = native.read_u16(p_d16)
    assert np.array_equal(d, d16)
    pf = native.ImagePrefetcher([p_gray] * 10, n_threads=3, ahead=4)
    out = list(pf)
    assert len(out) == 10 and all(np.array_equal(o, img) for o in out)
