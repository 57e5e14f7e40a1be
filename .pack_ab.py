import time, functools, jax, jax.numpy as jnp, numpy as np
from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.ops import spectral as sp
from xlab_fftbarotropic_tpu.models import barotropic as bt

N = 2048
cfg = ModelConfig(nx=N, ny=N)
t = sp.SpectralTables.from_config(cfg)
g = cfg.grid_shape
rng = np.random.RandomState(0)
vort = rng.randn(N, N).astype(np.float32) * 1e-4

def herm_full(s, ny):
    """(nx, hny) half-spectrum of a REAL field -> full (nx, ny) spectrum."""
    # cols 1..ny//2-1 mirrored: S_full[i, ny-j] = conj(S[i, j]) with row reflect
    body = jnp.conj(s[:, 1:ny//2])          # (nx, ny//2-1), cols 1..ny//2-1
    body = body[:, ::-1]                    # cols ny//2-1..1 -> maps to ny-j
    body = jnp.concatenate([body[:1], body[1:][::-1]], axis=0)  # row i -> -i mod nx
    return jnp.concatenate([s, body], axis=1)

def inv2(sa, sb, ny):
    """two real-field inverse transforms via ONE c2c ifft2."""
    c = herm_full(sa, ny) + 1j * herm_full(sb, ny)
    z = jnp.fft.ifft2(c)
    return jnp.real(z), jnp.imag(z)

def tendency_packed(t, zeta_hat, src, nu, grid_shape):
    ny = grid_shape[1]
    lvort_hat = sp.laplacian(t, zeta_hat)
    psi_hat = sp.invert_laplacian(t, zeta_hat)
    dvdx, dvdy = inv2(sp.gradx(t, zeta_hat), sp.grady(t, zeta_hat), ny)
    u, v = inv2(-sp.grady(t, psi_hat), sp.gradx(t, psi_hat), ny)
    dvortdt = -u * dvdx - v * dvdy + src
    return jnp.fft.rfft2(dvortdt) + lvort_hat * nu

def make_seg(tnd):
    def step(z, src):
        d = lambda zz: sp.dealias(t, tnd(t, zz, src, cfg.nu, g))
        k1 = d(z); k2 = d(z + k1*(cfg.dt*0.5))
        k3 = d(z + k2*(cfg.dt*0.5)); k4 = d(z + k3*cfg.dt)
        return z + (k1+2*k2+2*k3+k4)*(cfg.dt/6.0)
    @jax.jit
    def seg(z, src):
        def body(zz, _): return step(zz, src), None
        out, _ = jax.lax.scan(body, z, None, length=10)
        return out
    return seg

z0 = jnp.fft.rfft2(jnp.asarray(vort))
src = jnp.zeros(g, jnp.float32)
results = {}
for name, tnd in [("separate", bt.tendency), ("packed", tendency_packed)]:
    seg = make_seg(tnd)
    out = seg(z0, src); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = seg(z0, src); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    results[name] = out
    print(f"{name}: {dt/10*1000:.2f} ms/step")
a, b = results["packed"], results["separate"]
err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
print("packed vs separate rel err:", err)
