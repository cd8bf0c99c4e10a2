"""Host-only numpy check of the cumsum-chord moment maps vs the direct
disc-gather IC moments (no jax/TPU needed)."""
import numpy as np

HALF_PATCH = 15
r = HALF_PATCH
XMAX = [int(np.floor(np.sqrt(r * r - dy * dy))) for dy in range(-r, r + 1)]

rng = np.random.RandomState(0)
H, W = 96, 128
img = rng.rand(H, W).astype(np.float64) * 255

# --- direct gather version (mirror of ops/orb.compute_orientations) ---
ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
mask = (xs ** 2 + ys ** 2) <= r * r
offs = np.stack([xs[mask], ys[mask]], -1)

def direct(u, v):
    x = np.clip(u + offs[:, 0], 0, W - 1)
    y = np.clip(v + offs[:, 1], 0, H - 1)
    vals = img[y, x]
    return (vals * offs[:, 0]).sum(), (vals * offs[:, 1]).sum()

# --- cumsum-chord version (mirror of orientation_moment_maps) ---
pad = r + 1
xcoord = np.arange(W, dtype=np.float64)[None, :] * np.ones((H, 1))
CxI = np.pad(np.cumsum(img, 1), ((0, 0), (1, 0)))
CxX = np.pad(np.cumsum(img * xcoord, 1), ((0, 0), (1, 0)))
CxI = np.pad(CxI, ((pad, pad), (pad, pad)), mode='edge')
CxX = np.pad(CxX, ((pad, pad), (pad, pad)), mode='edge')

def chord(C, dy, xm):
    hi = C[pad + dy: pad + dy + H, pad + xm + 1: pad + xm + 1 + W]
    lo = C[pad + dy: pad + dy + H, pad - xm: pad - xm + W]
    return hi - lo

m01 = np.zeros((H, W))
m10 = np.zeros((H, W))
for dy in range(-r, r + 1):
    xm = XMAX[dy + r]
    S = chord(CxI, dy, xm)
    m10 += chord(CxX, dy, xm) - xcoord * S
    if dy != 0:
        m01 += dy * S

errs = []
for _ in range(200):
    u = rng.randint(r + 2, W - r - 2)
    v = rng.randint(r + 2, H - r - 2)
    g10, g01 = direct(u, v)
    errs.append((abs(m10[v, u] - g10), abs(m01[v, u] - g01)))
errs = np.array(errs)
print("max abs err m10, m01 (interior):", errs.max(0))
assert errs.max() < 1e-6
print("PASS")
