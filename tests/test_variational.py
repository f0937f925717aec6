"""Variational stack: operator adjointness, golden half-steps, solver behavior."""
import jax.numpy as jnp
import numpy as np
import pytest

from kangaroo_tpu.variational import deconvolution, ops, rof, tgv


class TestOperators:
    def test_grad_forward_values(self):
        u = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        g = np.asarray(ops.grad_forward(u))
        assert g[1, 1, 0] == 1.0  # dx
        assert g[1, 1, 1] == 4.0  # dy
        assert g[1, 3, 0] == 0.0  # far boundary zero
        assert g[2, 1, 1] == 0.0

    def test_div_adjoint_of_grad(self, rng):
        # <grad u, p> == -<u, div p>? reference pair: div is the negative
        # adjoint of the forward gradient with these boundary conventions.
        # In the solver p's far-boundary entries stay zero (dual ascent adds
        # sigma*grad which is zero there); on that subspace div is the exact
        # negative adjoint. The reference's DivA reads the boundary entries
        # too, so we zero them as the solver state does.
        u = jnp.asarray(rng.random((6, 7)).astype(np.float32))
        p = rng.random((6, 7, 2)).astype(np.float32)
        p[:, -1, 0] = 0.0
        p[-1, :, 1] = 0.0
        p = jnp.asarray(p)
        lhs = float(jnp.sum(ops.grad_forward(u) * p))
        rhs = float(jnp.sum(u * ops.divergence(p)))
        assert lhs == pytest.approx(-rhs, rel=1e-4)

    def test_epsilon_adjoint(self, rng):
        # <Eps v, q>_sym == -<v, div_sym q> with the duplicated off-diagonal
        # inner product the reference's float4 layout implies
        v = jnp.asarray(rng.random((6, 7, 2)).astype(np.float32))
        q = rng.random((6, 7, 3)).astype(np.float32)
        q[:, -1, :] = 0.0  # boundary band where the operators' conventions
        q[-1, :, :] = 0.0  # differ; adjointness holds on the interior
        q = jnp.asarray(q)
        e = ops.epsilon(v)
        lhs = float(
            jnp.sum(e[..., 0] * q[..., 0] + e[..., 1] * q[..., 1] + 2 * e[..., 2] * q[..., 2])
        )
        rhs = float(jnp.sum(v * ops.divergence_sym(q)))
        assert lhs == pytest.approx(-rhs, rel=1e-3)

    def test_project_unit_ball(self):
        p = jnp.array([[[3.0, 4.0]]])
        out = np.asarray(ops.project_unit_ball(p))
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-6)
        small = jnp.array([[[0.3, 0.4]]])
        np.testing.assert_allclose(np.asarray(ops.project_unit_ball(small)), np.asarray(small))


class TestRofGolden:
    def test_huber_dual_ascent_matches_scalar(self, rng):
        H, W = 5, 6
        u = rng.random((H, W)).astype(np.float32)
        p = (rng.random((H, W, 2)).astype(np.float32) - 0.5) * 0.5
        sigma, alpha = 0.7, 0.002
        got = np.asarray(rof.huber_dual_ascent_p(jnp.asarray(p), jnp.asarray(u), sigma, alpha))
        for y in range(H):
            for x in range(W):
                du = np.zeros(2, np.float32)
                if x < W - 1:
                    du[0] = u[y, x + 1] - u[y, x]
                if y < H - 1:
                    du[1] = u[y + 1, x] - u[y, x]
                np_ = (p[y, x] + sigma * du) / (1 + sigma * alpha)
                want = np_ / max(1.0, np.linalg.norm(np_))
                np.testing.assert_allclose(got[y, x], want, rtol=1e-5, atol=1e-6)

    def test_l2_primal_descent_matches_scalar(self, rng):
        H, W = 5, 6
        u = rng.random((H, W)).astype(np.float32)
        g = rng.random((H, W)).astype(np.float32)
        p = (rng.random((H, W, 2)).astype(np.float32) - 0.5) * 0.5
        tau, lam = 0.7, 5.0
        got = np.asarray(
            rof.l2_primal_descent(jnp.asarray(u), jnp.asarray(p), jnp.asarray(g), tau, lam)
        )
        for y in range(H):
            for x in range(W):
                divp = p[y, x, 0] + p[y, x, 1]
                if x > 0:
                    divp -= p[y, x - 1, 0]
                if y > 0:
                    divp -= p[y - 1, x, 1]
                want = (u[y, x] + tau * (divp + lam * g[y, x])) / (1 + tau * lam)
                assert got[y, x] == pytest.approx(want, rel=1e-5)


def _noisy_step(rng, H=32, W=32, noise=0.2):
    img = np.zeros((H, W), np.float32)
    img[:, W // 2 :] = 1.0
    noisy = img + rng.normal(0, noise, (H, W)).astype(np.float32)
    return img, noisy


class TestSolvers:
    def test_rof_denoise_reduces_error(self, rng):
        clean, noisy = _noisy_step(rng)
        out = np.asarray(rof.denoise(jnp.asarray(noisy), lam=8.0, iterations=80))
        err_in = np.abs(noisy - clean).mean()
        err_out = np.abs(out - clean).mean()
        assert err_out < 0.5 * err_in

    def test_tv_vs_huber_both_run(self, rng):
        _, noisy = _noisy_step(rng)
        for model in ("tv", "huber"):
            out = rof.denoise(jnp.asarray(noisy), lam=8.0, iterations=20, model=model)
            assert np.isfinite(np.asarray(out)).all()

    def test_weighted_variants_run(self, rng):
        _, noisy = _noisy_step(rng, 16, 16)
        u = jnp.asarray(noisy)
        w = jnp.ones_like(u) * 0.8
        p = jnp.zeros(u.shape + (2,))
        p = rof.weighted_huber_dual_ascent_p(p, u, w, 0.7, 0.002)
        u2 = rof.weighted_l2_primal_descent(u, p, u, w, 0.7, 5.0)
        assert np.isfinite(np.asarray(u2)).all()

    def test_tgv_denoise_reduces_error(self, rng):
        # TGV shines on affine signals: ramp + noise
        H, W = 32, 32
        ramp = np.linspace(0, 1, W, dtype=np.float32)[None, :].repeat(H, 0)
        noisy = ramp + rng.normal(0, 0.15, (H, W)).astype(np.float32)
        out = np.asarray(
            tgv.denoise(jnp.asarray(noisy), sigma=0.29, tau=0.29, delta=0.05, iterations=500)
        )
        err_in = np.abs(noisy - ramp).mean()
        err_out = np.abs(out - ramp).mean()
        assert err_out < 0.5 * err_in

    def test_deconvolve_sharpens(self, rng):
        H, W = 24, 24
        clean = np.zeros((H, W), np.float32)
        clean[8:16, 8:16] = 1.0
        k = np.ones((5, 5), np.float32)
        from kangaroo_tpu.ops.convolution import convolve

        blurry = np.asarray(convolve(jnp.asarray(clean), jnp.asarray(k)))
        out = np.asarray(
            deconvolution.deconvolve(jnp.asarray(blurry), jnp.asarray(k), iterations=150)
        )
        err_blur = np.abs(blurry - clean).mean()
        err_out = np.abs(out - clean).mean()
        assert err_out < err_blur

    def test_inpaint_fills_hole(self, rng):
        H, W = 24, 24
        clean = np.linspace(0, 1, W, dtype=np.float32)[None, :].repeat(H, 0)
        mask = np.ones((H, W), np.float32)
        mask[8:16, 8:16] = 0.0
        corrupted = clean.copy()
        corrupted[8:16, 8:16] = 0.0
        out = np.asarray(
            deconvolution.inpaint(jnp.asarray(corrupted), jnp.asarray(mask), iterations=300)
        )
        hole_err = np.abs(out[10:14, 10:14] - clean[10:14, 10:14]).mean()
        assert hole_err < 0.1


class TestWeightedGoldenScalarModels:
    """The edge-weighted DTAM half-step pair vs reference_impl's scalar
    loops (WeightedHuberGradU_DualAscentP cu_rof_denoising.cu:114-141,
    WeightedL2_u_minus_g_PrimalDescent :211-236)."""

    def test_weighted_huber_dual_ascent(self, rng):
        import reference_impl as ref

        H, W = 6, 7
        u = rng.random((H, W)).astype(np.float32)
        g = rng.random((H, W)).astype(np.float32)
        p = (rng.random((H, W, 2)).astype(np.float32) - 0.5) * 0.8
        got = np.asarray(rof.weighted_huber_dual_ascent_p(
            jnp.asarray(p), jnp.asarray(u), jnp.asarray(g), 0.7, 0.002))
        want = ref.weighted_huber_dual_ascent_p(
            p.astype(np.float64), u.astype(np.float64),
            g.astype(np.float64), 0.7, 0.002)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_weighted_l2_primal_descent(self, rng):
        import reference_impl as ref

        H, W = 6, 7
        u = rng.random((H, W)).astype(np.float32)
        a = rng.random((H, W)).astype(np.float32)
        g = rng.random((H, W)).astype(np.float32)
        p = (rng.random((H, W, 2)).astype(np.float32) - 0.5) * 0.8
        got = np.asarray(rof.weighted_l2_primal_descent(
            jnp.asarray(u), jnp.asarray(p), jnp.asarray(a), jnp.asarray(g),
            0.7, 12.5))
        want = ref.weighted_l2_primal_descent(
            u.astype(np.float64), p.astype(np.float64),
            a.astype(np.float64), g.astype(np.float64), 0.7, 12.5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
