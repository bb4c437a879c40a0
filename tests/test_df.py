"""Double-float (compensated f32) arithmetic: exactness under jit.

These identities are the foundation of the polish stage's high-precision
residuals (VERDICT item 1: close the f32 control-parity gap without f64
hardware). They must hold *under jit on the running backend* — the
failure mode they defend against is LLVM FMA contraction / fusion
rewriting the error-free transformations (see ops/df.py module
docstring), which plain eager tests do not exercise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intent_mpc_tpu.ops import df


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, dtype=jnp.float32) * scale)


def test_two_sum_exact_under_jit():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = _rand(k1, (4096,))
    b = _rand(k2, (4096,), scale=1e-4)   # force nontrivial rounding

    s, e = jax.jit(df.two_sum)(a, b)
    # s + e == a + b exactly, verified in f64 on host
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)
    # and e is genuinely nonzero somewhere (the test has teeth)
    assert np.any(np.asarray(e) != 0.0)


def test_two_prod_exact_under_jit():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = _rand(k1, (4096,))
    b = _rand(k2, (4096,))

    p, e = jax.jit(df.two_prod)(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)
    assert np.any(np.asarray(e) != 0.0)


def test_split_is_exact_and_fma_immune():
    k = jax.random.PRNGKey(2)
    a = _rand(k, (4096,), scale=1e6)
    hi, lo = jax.jit(df.split)(a)
    np.testing.assert_array_equal(np.asarray(hi) + np.asarray(lo),
                                  np.asarray(a))
    # each half fits in 12 stored-mantissa bits -> products are exact
    h64 = np.asarray(hi, np.float64)
    l64 = np.asarray(lo, np.float64)
    np.testing.assert_array_equal(
        (h64 * h64).astype(np.float32).astype(np.float64), h64 * h64)
    np.testing.assert_array_equal(
        (l64 * l64).astype(np.float32).astype(np.float64), l64 * l64)


@pytest.mark.parametrize("n", [7, 64, 385, 1024])
def test_df_matvec_near_f64(n):
    """Jitted compensated matvec ~eps32^2 accurate vs f64 reference."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    M = _rand(k1, (n, n))
    x = _rand(k2, (n,))

    hi, lo = jax.jit(df.df_matvec)(M, x, jnp.zeros_like(x))
    ref = np.asarray(M, np.float64) @ np.asarray(x, np.float64)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    err = np.max(np.abs(got - ref) / (np.abs(ref) + 1.0))
    assert err < 1e-12, f"compensated matvec err {err:.3e}"


def test_df_matvec_captures_cancellation():
    """The residual case: b - M x with b ~ M x. Plain f32 loses all
    signal; the compensated path recovers it."""
    n = 385
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    M = _rand(k1, (n, n))
    x = _rand(k2, (n,))
    M64 = np.asarray(M, np.float64)
    x64 = np.asarray(x, np.float64)
    b64 = M64 @ x64
    b = jnp.asarray(b64, jnp.float32)          # rounded rhs

    @jax.jit
    def resid_df(M, x, b):
        ph, pl = df.df_matvec(M, x, jnp.zeros_like(x))
        rh, rl = df.df_add(b, jnp.zeros_like(b), -ph, -pl)
        return rh + rl

    @jax.jit
    def resid_f32(M, x, b):
        return b - M @ x

    ref = np.asarray(b, np.float64) - b64      # true residual of rounded b
    err_df = np.max(np.abs(np.asarray(resid_df(M, x, b), np.float64) - ref))
    err_f32 = np.max(np.abs(np.asarray(resid_f32(M, x, b), np.float64) - ref))
    assert err_df < 1e-9, f"df residual err {err_df:.3e}"
    # the compensated residual must beat plain f32 by orders of magnitude
    assert err_df < err_f32 * 1e-4, (err_df, err_f32)


def test_df_dot_exact():
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    a = _rand(k1, (4096,))
    b = _rand(k2, (4096,))
    hi, lo = jax.jit(df.df_dot_accurate)(a, b)
    ref = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    got = float(np.asarray(hi, np.float64)) + float(np.asarray(lo, np.float64))
    assert abs(got - ref) / (abs(ref) + 1.0) < 1e-12
