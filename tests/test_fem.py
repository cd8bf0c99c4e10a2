import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_e_tpu.ops import fem


def grid_points(n=6, extent=1.0, z=5.0, bump=0.0, seed=0):
    xs, ys = np.meshgrid(np.linspace(-extent, extent, n),
                         np.linspace(-extent, extent, n))
    zs = np.full_like(xs, z) + bump * np.exp(-(xs ** 2 + ys ** 2))
    pts = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1).astype(np.float32)
    uv = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32) * 100 + 200
    return pts, uv


def test_elasticity_matrix():
    D = fem.elasticity_matrix()
    assert D.shape == (6, 6)
    w = np.linalg.eigvalsh(D.astype(np.float64))
    assert w.min() > 0  # positive definite


@pytest.mark.parametrize("el_type", [1, 2])
def test_build_mesh(el_type):
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=el_type, max_nodes=2048,
                          max_elems=2048)
    assert mesh is not None
    n_act = int(mesh.n_nodes_active)
    assert n_act >= 2 * len(pts)
    assert int(mesh.elem_valid.sum()) > 10
    # every valid element references in-range nodes: layer-1 in [0, ns),
    # layer-2 in [half, half + ns) where half = capacity // 2
    el = np.asarray(mesh.elements)[np.asarray(mesh.elem_valid)]
    half = mesh.u0.shape[0] // 2
    ns = n_act // 2
    used = el[el >= 0]
    assert ((used < ns) | ((used >= half) & (used < half + ns))).all()
    if el_type == 1:
        assert (el[:, 6:] == -1).all()   # prism rows: 6 nodes
    else:
        assert (el >= 0).all()           # hex rows: 8 nodes


@pytest.mark.parametrize("el_type", [1, 2])
def test_rigid_motion_zero_energy(el_type):
    """Linearized strain is exactly zero for translations and infinitesimal
    rotations — the FEM term must not penalize rigid relocalization."""
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=el_type)
    ke = fem.element_stiffness_batch(mesh)
    base = fem.node_positions(mesh, jnp.asarray(pts))
    e0 = float(fem.strain_energy(mesh, ke, base))
    assert e0 < 1e-3, e0   # reference positions: zero displacement
    # translation
    e_t = float(fem.strain_energy(mesh, ke,
                                  base + jnp.asarray([0.3, -0.2, 0.5])))
    assert e_t < 1e-2, e_t


@pytest.mark.parametrize("el_type", [1, 2])
def test_deformation_positive_energy(el_type):
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=el_type)
    ke = fem.element_stiffness_batch(mesh)
    # bump the middle of the surface: real deformation
    pts_def = pts.copy()
    r2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
    pts_def[:, 2] += 0.2 * np.exp(-r2 * 2)
    node_def = fem.node_positions(mesh, jnp.asarray(pts_def))
    e = float(fem.strain_energy(mesh, ke, node_def))
    assert e > 1e-2, e


def test_energy_monotonic_with_magnitude():
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=1)
    ke = fem.element_stiffness_batch(mesh)
    energies = []
    for mag in (0.05, 0.1, 0.2):
        pts_def = pts.copy()
        pts_def[:, 2] += mag * np.sin(pts[:, 0] * 3)
        node_def = fem.node_positions(mesh, jnp.asarray(pts_def))
        energies.append(float(fem.strain_energy(mesh, ke, node_def)))
    assert energies[0] < energies[1] < energies[2]
    # quadratic form: 2x displacement -> ~4x energy
    np.testing.assert_allclose(energies[2] / energies[1], 4.0, rtol=0.2)


def test_ke_symmetric():
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=2)
    ke = np.asarray(fem.element_stiffness_batch(mesh))
    valid = np.asarray(mesh.elem_valid)
    k0 = ke[valid][0]
    np.testing.assert_allclose(k0, k0.T, atol=1e-2 * np.abs(k0).max())
    w = np.linalg.eigvalsh(k0.astype(np.float64))
    assert w.min() > -1e-2 * abs(w).max()  # PSD up to roundoff


def test_node_positions_interpolation():
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=2)  # has midpoints/barycenters
    moved = pts.copy()
    moved[:, 0] += 0.5
    pos = np.asarray(fem.node_positions(mesh, jnp.asarray(moved)))
    n_act = int(mesh.n_nodes_active)
    half = pos.shape[0] // 2
    # surface nodes all shifted by the same +0.5 in x (linear interpolation)
    base = np.asarray(fem.node_positions(mesh, jnp.asarray(pts)))
    d = pos[:n_act // 2, 0] - base[:n_act // 2, 0]
    np.testing.assert_allclose(d, 0.5, atol=1e-5)


def test_nodal_forces_zero_at_rest():
    pts, uv = grid_points()
    mesh = fem.build_mesh(pts, uv, el_type=1)
    ke = fem.element_stiffness_batch(mesh)
    f = np.asarray(fem.nodal_forces(
        mesh, ke, fem.node_positions(mesh, jnp.asarray(pts))))
    assert np.abs(f).max() < 1e-2


def _assemble_dense_K(mesh, ke):
    """Dense K from element blocks (test oracle)."""
    M = mesh.u0.shape[0]
    K = np.zeros((3 * M, 3 * M))
    elems = np.asarray(mesh.elements)
    valid = np.asarray(mesh.elem_valid)
    for e in range(elems.shape[0]):
        if not valid[e]:
            continue
        nodes = elems[e]
        for a in range(8):
            if nodes[a] < 0:
                continue
            for b in range(8):
                if nodes[b] < 0:
                    continue
                K[3 * nodes[a]:3 * nodes[a] + 3,
                  3 * nodes[b]:3 * nodes[b] + 3] += \
                    ke[e, 3 * a:3 * a + 3, 3 * b:3 * b + 3]
    return K


def test_stiffness_matvec_matches_dense():
    pts, uv = grid_points(n=4)
    mesh = fem.build_mesh(pts, uv, el_type=1, max_nodes=64, max_elems=64)
    ke = fem.element_stiffness_batch(mesh)
    K = _assemble_dense_K(mesh, np.asarray(ke))
    rng = np.random.RandomState(0)
    x = rng.randn(mesh.u0.shape[0], 3).astype(np.float32) * 0.01
    got = np.asarray(fem.stiffness_matvec(mesh, ke, jnp.asarray(x)))
    want = (K @ x.reshape(-1)).reshape(-1, 3)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2 * max(
        1.0, np.abs(want).max()))


def test_solve_displacement_mode2():
    """CG displacement propagation (mode 2) matches the dense solve the
    reference does with an explicit K inverse (FEA2.cc:1661,1914)."""
    pts, uv = grid_points(n=4)
    mesh = fem.build_mesh(pts, uv, el_type=1, max_nodes=64, max_elems=64)
    ke = fem.element_stiffness_batch(mesh)
    M = mesh.u0.shape[0]
    half = M // 2
    n_surf = len(pts)
    # Dirichlet: all layer-2 nodes + the first 4 surface nodes
    fixed = np.zeros((M,), bool)
    fixed[half:] = True
    fixed[:4] = True
    # also pin padded (inactive) node slots
    active = np.zeros((M,), bool)
    active[:n_surf] = True
    active[half:half + n_surf] = True
    fixed |= ~active
    f = np.zeros((M, 3), np.float32)
    f[5, 2] = 10.0   # poke one free surface node
    a = np.asarray(fem.solve_displacement(
        mesh, ke, jnp.asarray(f), jnp.asarray(fixed), iters=200))
    # dense oracle
    K = _assemble_dense_K(mesh, np.asarray(ke))
    free_idx = np.where(np.repeat(~fixed, 3))[0]
    Kff = K[np.ix_(free_idx, free_idx)]
    af = np.linalg.solve(Kff + 1e-9 * np.eye(len(free_idx)),
                         f.reshape(-1)[free_idx])
    want = np.zeros((3 * M,))
    want[free_idx] = af
    want = want.reshape(-1, 3)
    scale = max(np.abs(want).max(), 1e-9)
    np.testing.assert_allclose(a, want, atol=0.05 * scale, rtol=0.05)
