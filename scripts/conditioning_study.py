"""Conditioning-regime study (VERDICT r4 item 3).

BASELINE.md records: "at noise 1e-4 the n=1024 SE Gram is beyond f32
entirely — even the trsm-exact path NaNs" and ATTRIBUTED the reference's
survival to f64 CPU LAPACK.  That attribution was untested in both
directions: the reference runs default-dtype torch, which is FLOAT32
(`/root/reference/GaussianProcess/cigp_v10.py:61-68` has no dtype
handling).  This script measures:

  1. the reference math (torch CPU) on the exact NaN fixture at f32 AND
     f64 — does the shipped reference actually survive this regime?
  2. our f32 paths (trsm-exact `mvn_nll`, the shipping se-analytic
     dispatch) — reproducing the recorded failure;
  3. the new opt-in x64 factorization path (`CIGP(x64_factor=True)`)
     — value/grad vs the f64 ground truth, and a short training run
     proving the case trains finite;
  4. the conditioning FRONTIER: sweep noise in {1e-2 .. 1e-6} and record
     where each path stops producing finite values (cond(Sigma) logged
     per cell from the f64 eigenvalues).

Usage:
  JAX_PLATFORMS=cpu python scripts/conditioning_study.py          # study
  python scripts/conditioning_study.py --tpu-x64-probe           # on-chip
"""

import sys

import numpy as np

FIXTURE_N = 1024


def fixture(n=FIXTURE_N, seed=0):
    """The BASELINE NaN case: x ~ U(0,20) d=1, SE(ls=1, sv=1)."""
    rng = np.random.default_rng(seed)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x).astype(np.float32)
    return x, y


def gram64(x, noise):
    d2 = (x.astype(np.float64) - x.astype(np.float64).T) ** 2
    K = np.exp(-0.5 * d2)
    return K + noise * np.eye(len(x))


def ground_truth(x, y, noise):
    """f64 NLML value + grad wrt log-lengthscale via numpy/scipy."""
    import scipy.linalg as sla

    x64 = x.astype(np.float64)
    y64 = y.astype(np.float64)
    d2 = (x64 - x64.T) ** 2
    K = np.exp(-0.5 * d2)
    Sigma = K + noise * np.eye(len(x))
    cond = np.linalg.cond(Sigma)
    L = np.linalg.cholesky(Sigma)
    alpha = sla.cho_solve((L, True), y64)
    nll = (
        0.5 * float(y64.T @ alpha)
        + np.log(np.diag(L)).sum()
        + 0.5 * len(x) * np.log(2 * np.pi)
    )
    # d nll / d log(ls): dK = K * d2 (ls=1); grad = 0.5 tr((aa^T - K^-1) dK) -> sign conv
    Kinv = sla.cho_solve((L, True), np.eye(len(x)))
    dK = K * d2  # d/d log ls of exp(-0.5 d2 / ls^2) at ls=1
    g = -0.5 * np.sum((alpha @ alpha.T - Kinv) * dK)
    return nll, g, cond


def torch_reference(x, y, noise, dtype):
    """The reference NLML+grad in torch at the given dtype
    (`cigp_v10.py:50-69` math: Gram -> cholesky -> triangular solves)."""
    import torch

    xt = torch.tensor(x, dtype=dtype)
    yt = torch.tensor(y, dtype=dtype)
    log_ls = torch.zeros(1, dtype=dtype, requires_grad=True)
    ls = log_ls.exp()
    d2 = torch.cdist(xt / ls, xt / ls) ** 2
    K = torch.exp(-0.5 * d2)
    Sigma = K + noise * torch.eye(len(x), dtype=dtype)
    try:
        L = torch.linalg.cholesky(Sigma)
        gamma = torch.linalg.solve_triangular(L, yt, upper=False)
        nll = (
            0.5 * (gamma**2).sum()
            + L.diagonal().log().sum()
            + 0.5 * len(x) * np.log(2 * np.pi)
        )
        nll.backward()
        return float(nll), float(log_ls.grad), None
    except Exception as e:  # noqa: BLE001
        return float("nan"), float("nan"), type(e).__name__


def our_paths(x, y, noise):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rows = {}
    for name, kw in [
        ("f32 trsm-exact", dict(se_analytic_nll=False, hybrid_nll=False)),
        ("f32 shipping", dict()),
        ("x64 factor", dict(x64_factor=True)),
    ]:
        # min_noise=0: expose the RAW conditioning regime (the shipping
        # relative noise floor would clamp the nugget back to 1e-4)
        gp = CIGP(kernel=SquaredExponentialKernel(), relative_jitter=False,
                  jitter=0.0, min_noise=0.0, **kw)
        p = gp.init_params(1)
        # exp parametrization: param 0 -> lengthscale 1, signal 1 (the
        # f64 ground-truth kernel); noise = exp(-log_beta) set exactly
        p["kernel"] = {
            "length_scale": jnp.zeros((1,), jnp.float32),
            "signal_variance": jnp.zeros((1,), jnp.float32),
        }
        p["log_beta"] = jnp.asarray([-np.log(noise)], jnp.float32)
        try:
            val, grad = jax.value_and_grad(
                lambda pp: gp.nll(pp, jnp.asarray(x), jnp.asarray(y))
            )(p)
            rows[name] = (float(val), float(grad["kernel"]["length_scale"][0]))
        except Exception as e:  # noqa: BLE001
            rows[name] = (float("nan"), float("nan"))
            print(f"  [{name}] raised {type(e).__name__}: {e}")
    return rows


def train_finite_check(x, y, noise, steps=50):
    """Short Adam run on the NaN case through the x64 path."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel
    from fidelityfusion_tpu.train.fit import adam_scan

    gp = CIGP(kernel=SquaredExponentialKernel(), relative_jitter=False,
              jitter=0.0, min_noise=0.0, x64_factor=True)
    p = gp.init_params(1)
    p["kernel"] = {
        "length_scale": jnp.zeros((1,), jnp.float32),
        "signal_variance": jnp.zeros((1,), jnp.float32),
    }
    p["log_beta"] = jnp.asarray([-np.log(noise)], jnp.float32)

    def loss_fn(pp):
        return gp.nll(pp, jnp.asarray(x), jnp.asarray(y))

    _, good, losses = adam_scan(loss_fn, p, optax.adam(1e-2), steps)
    losses = np.asarray(losses)
    return losses


def main():
    if "--tpu-x64-probe" in sys.argv:
        tpu_probe()
        return
    x, y = fixture()

    print("=== BASELINE NaN case: n=1024 SE Gram, noise 1e-4 ===")
    nll64, g64, cond = ground_truth(x, y, 1e-4)
    print(f"f64 ground truth: nll={nll64:.4f} g_ls={g64:.4f} cond={cond:.3e}")

    for dtype_name in ("float32", "float64"):
        import torch

        dt = getattr(torch, dtype_name)
        v, g, err = torch_reference(x, y, 1e-4, dt)
        tag = f" ({err})" if err else ""
        print(f"reference torch {dtype_name}: nll={v:.4f} g={g:.4f}{tag}")

    rows = our_paths(x, y, 1e-4)
    for name, (v, g) in rows.items():
        print(f"ours {name}: nll={v:.4f} g_ls={g:.4f}")

    losses = train_finite_check(x, y, 1e-4)
    print(f"x64-path training: steps={len(losses)} "
          f"finite={int(np.isfinite(losses).sum())} "
          f"first={losses[0]:.3f} last_finite="
          f"{losses[np.isfinite(losses)][-1]:.3f}")

    print("\n=== conditioning frontier (noise sweep) ===")
    print(f"{'noise':>8} {'cond':>10} {'ref f32':>10} {'ref f64':>10} "
          f"{'ours f32':>10} {'ours x64':>10}")
    import torch

    for noise in (1e-2, 1e-3, 1e-4, 1e-5, 1e-6):
        _, _, cond = ground_truth(x, y, noise)
        rf32, _, e32 = torch_reference(x, y, noise, torch.float32)
        rf64, _, _ = torch_reference(x, y, noise, torch.float64)
        ours = our_paths(x, y, noise)
        o32 = ours["f32 shipping"][0]
        o64 = ours["x64 factor"][0]

        def s(v, err=None):
            if err:
                return f"FAIL:{err[:6]}"
            return f"{v:10.2f}" if np.isfinite(v) else "NaN"

        print(f"{noise:8.0e} {cond:10.2e} {s(rf32, e32):>10} {s(rf64):>10} "
              f"{s(o32):>10} {s(o64):>10}")


def tpu_probe():
    """Does f64 cholesky work on the axon TPU at all (and at what cost)?"""
    import time

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    with jax.enable_x64(True):
        a = jnp.asarray(np.random.default_rng(0).random((512, 512)))
        A = a @ a.T + 512 * jnp.eye(512, dtype=a.dtype)
        print("dtype in:", A.dtype)
        try:
            L = jnp.linalg.cholesky(A)
            L.block_until_ready()
            t0 = time.time()
            for _ in range(3):
                jnp.linalg.cholesky(A + 0.0).block_until_ready()
            print(f"f64 chol(512) on TPU OK, {(time.time()-t0)/3*1e3:.2f} ms")
            print("max|LL^T - A|:", float(jnp.max(jnp.abs(L @ L.T - A))))
        except Exception as e:  # noqa: BLE001
            print("f64 chol on TPU FAILED:", type(e).__name__, e)


if __name__ == "__main__":
    main()
