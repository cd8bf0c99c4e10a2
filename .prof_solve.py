import time, numpy as np, jax, jax.numpy as jnp

rng = np.random.RandomState(0)
for n in (384, 192):
    A = rng.randn(n, n).astype(np.float32)
    S = A @ A.T + n * np.eye(n, dtype=np.float32)
    b = rng.randn(n).astype(np.float32)
    S, b = jnp.asarray(S), jnp.asarray(b)

    def timeit(name, fn, nrep=10):
        jax.block_until_ready(fn(0.0))
        t0 = time.perf_counter()
        for i in range(nrep):
            r = fn(float(i + 1) * 1e-6)
        jax.block_until_ready(r)
        print(f"n={n} {name:28s} {(time.perf_counter()-t0)/nrep*1000:8.3f} ms",
              flush=True)

    timeit("linalg.solve (LU)",
           jax.jit(lambda s: jnp.linalg.solve(S + s * jnp.eye(n), b)))
    timeit("cho_factor+cho_solve",
           jax.jit(lambda s: jax.scipy.linalg.cho_solve(
               jax.scipy.linalg.cho_factor(S + s * jnp.eye(n)), b)))

    def cg(s):
        Ss = S + s * jnp.eye(n)
        d = jnp.diagonal(Ss)
        def body(i, st):
            x, r, p, rz = st
            Ap = Ss @ p
            alpha = rz / jnp.dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = r / d
            rz2 = jnp.dot(r, z)
            p = z + (rz2 / rz) * p
            return (x, r, p, rz2)
        x = jnp.zeros_like(b)
        r0 = b
        z0 = r0 / d
        st = (x, r0, z0, jnp.dot(r0, z0))
        return jax.lax.fori_loop(0, 40, body, st)[0]
    timeit("jacobi-CG 40 iters", jax.jit(cg))

    # accuracy check
    x_lu = jnp.linalg.solve(S, b)
    x_cg = cg(0.0)
    print(f"n={n} cg rel err: {float(jnp.linalg.norm(x_cg - x_lu) / jnp.linalg.norm(x_lu)):.2e}")
