"""Custom VJPs of the fused Pallas transforms (ops/pallas_diff.py).

The backward rules are pinned directly against jax.vjp of the jnp.fft
wrappers (which carry JAX's registered FFT differentiation rules), and
end-to-end rollout gradients through adjoint.make_rollout must agree
between the pallas and xla backends at float32 round-off — the same
differential-vs-reference discipline as the forward kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlab_fftbarotropic_tpu import adjoint
from xlab_fftbarotropic_tpu.config import ModelConfig
from xlab_fftbarotropic_tpu.ops import fft
from xlab_fftbarotropic_tpu.ops import pallas_diff as pd

N = 64


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return (np.linalg.norm(np.ravel(a - b))
            / max(np.linalg.norm(np.ravel(a)), 1e-30))


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_forward_vjp_matches_jnp_fft():
    g = (N, N)
    r = _rng()
    x = jnp.asarray(r.standard_normal(g).astype(np.float32))
    ct = jnp.asarray((r.standard_normal((N, N // 2 + 1))
                      + 1j * r.standard_normal((N, N // 2 + 1)))
                     .astype(np.complex64))
    _, vjp_ref = jax.vjp(fft.forward, x)
    _, vjp_new = jax.vjp(pd.forward, x)
    assert _rel(vjp_ref(ct)[0], vjp_new(ct)[0]) < 1e-5
    # primal agreement too
    assert _rel(fft.forward(x), pd.forward(x)) < 1e-5


def test_inverse_and_pair_vjps_match_jnp_fft():
    g = (N, N)
    r = _rng(1)
    S = fft.forward(jnp.asarray(r.standard_normal(g).astype(np.float32)))
    S2 = fft.forward(jnp.asarray(r.standard_normal(g).astype(np.float32)))
    u = jnp.asarray(r.standard_normal(g).astype(np.float32))
    u2 = jnp.asarray(r.standard_normal(g).astype(np.float32))

    _, vjp_ref = jax.vjp(lambda s: fft.inverse(s, g), S)
    _, vjp_new = jax.vjp(lambda s: pd.inverse(s, g), S)
    assert _rel(vjp_ref(u)[0], vjp_new(u)[0]) < 1e-5

    _, vjp_ref = jax.vjp(lambda p, q: fft.inverse_pair(p, q, g), S, S2)
    _, vjp_new = jax.vjp(lambda p, q: pd.inverse_pair(p, q, g), S, S2)
    a = vjp_ref((u, u2))
    b = vjp_new((u, u2))
    assert _rel(a[0], b[0]) < 1e-5 and _rel(a[1], b[1]) < 1e-5


@pytest.mark.parametrize("model_kind", ["barotropic", "sw", "tracer"])
def test_rollout_gradient_pallas_vs_xla(model_kind):
    """jax.grad through the checkpointed rollout: the pallas-diff
    backend must reproduce the XLA-path gradient at f32 round-off."""
    r = _rng(2)
    g = (N, N)
    kw = dict(dt=0.5) if model_kind == "sw" else dict(dt=1.0)
    cfg_x = ModelConfig(nx=N, ny=N, fft_backend="xla", **kw)
    cfg_p = ModelConfig(nx=N, ny=N, fft_backend="pallas", **kw)
    vort0 = jnp.asarray((1e-4 * r.standard_normal(g)).astype(np.float32))
    src = jnp.zeros(g, jnp.float32)
    if model_kind == "tracer":
        from xlab_fftbarotropic_tpu.models.tracer import tracer_ic
        ic = (vort0, jnp.asarray(tracer_ic(cfg_x, "gaussian")))
    else:
        ic = vort0

    def gradient(cfg):
        roll = adjoint.make_rollout(cfg, n_steps=3,
                                    model_kind=model_kind,
                                    tracer_kappa=5.0)

        def loss(ic, src):
            out = roll(ic, src)
            leaves = jax.tree_util.tree_leaves(out)
            return 0.5 * sum(jnp.mean(jnp.square(a)) for a in leaves)

        return jax.grad(loss)(ic, src)

    gx = gradient(cfg_x)
    gp = gradient(cfg_p)
    # f32 round-off class: the tracer family's joint chain accumulates
    # to ~1e-4 rel on its tiny-magnitude vorticity-gradient leaf
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        assert np.isfinite(np.asarray(b)).all()
        assert _rel(a, b) < 5e-4
