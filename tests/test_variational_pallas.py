"""Interpret-mode parity of the in-VMEM Pallas variational solvers against
the XLA fori_loop twins (same convention as tests/test_pallas_kernels.py:
the kernel logic is proven here; the bench's on-chip parity gate proves the
compiled lowering)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from kangaroo_tpu.variational import pallas_solvers as ps
from kangaroo_tpu.variational import rof, tgv


_real_pallas_call = pl.pallas_call


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        ps.pl, "pallas_call",
        lambda *a, **k: _real_pallas_call(*a, interpret=True, **k))
    yield


@pytest.fixture
def img():
    rng = np.random.default_rng(11)
    clean = np.zeros((48, 128), np.float32)
    clean[12:30, 40:90] = 0.8
    noisy = clean + 0.15 * rng.standard_normal((48, 128)).astype(np.float32)
    return jnp.asarray(noisy)


@pytest.mark.parametrize("model", ["tv", "huber"])
def test_rof_matches_xla(img, model):
    want = np.asarray(rof._denoise_xla(img, 8.0, iterations=40, model=model))
    got = np.asarray(ps.rof_denoise(img, 8.0, iterations=40, model=model))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tgv_matches_xla(img):
    want = np.asarray(tgv._denoise_xla(img, iterations=40))
    got = np.asarray(ps.tgv_denoise(img, iterations=40))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rof_denoises(img):
    out = np.asarray(ps.rof_denoise(img, 8.0, iterations=100))
    # total variation must drop substantially
    def tv(x):
        return np.abs(np.diff(x, axis=0)).sum() + np.abs(np.diff(x, axis=1)).sum()
    assert tv(out) < 0.5 * tv(np.asarray(img))


def test_dispatch_falls_back_off_tpu(img):
    # on the CPU test platform denoise() must route to the XLA twin
    # (ulp-level tolerance: the wrapper passes the solver constants as jit
    # operands while a direct call bakes the defaults in as constants,
    # which XLA fuses slightly differently)
    out = rof.denoise(img, 8.0, iterations=10)
    want = rof._denoise_xla(img, 8.0, iterations=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_inpaint_matches_xla(img):
    from kangaroo_tpu.variational import deconvolution as dec

    mask = jnp.ones(img.shape, jnp.float32).at[20:28, 60:100].set(0.0)
    want = np.asarray(dec._inpaint_xla(img, mask, iterations=40))
    got = np.asarray(ps.rof_denoise(img, 10.0, iterations=40, model="huber",
                                    lam_weight=mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_traced_params_jit(img):
    # regression: the dispatchers must trace with non-static solver
    # parameters (an outer jit sweeping lam), on both backends
    @jax.jit
    def sweep(x, lam):
        return ps.rof_denoise(x, lam, iterations=5)

    a = np.asarray(sweep(img, jnp.float32(3.0)))
    b = np.asarray(sweep(img, jnp.float32(9.0)))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-4  # lam is a real operand, not baked

    @jax.jit
    def sweep_tgv(x, a0):
        return ps.tgv_denoise(x, alpha0=a0, iterations=5)

    assert np.isfinite(np.asarray(sweep_tgv(img, jnp.float32(2.0)))).all()
