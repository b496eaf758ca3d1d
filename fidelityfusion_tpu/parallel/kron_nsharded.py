"""n-axis sharded Kronecker/HOGP NLML: distributed mode-products +
tracked-spectrum training over the mesh.

Closes SURVEY §5.7's named gap ("sharded Kronecker mode-products for
GAR"): the reference hot path (`GaussianProcess/hogp_simple.py:73-113` —
eigh per mode + dense mode-dot chains) is single-device and O(n^3)-per-
step in the mode-0 (training-set) axis once spectral tracking replaces
the eigh (`ops/spectral.py`: the tracked step IS a chain of ~12
n^3-class GEMMs — Rayleigh-Ritz, Newton-Schulz orthonormalization,
basis rotations).  Those GEMMs are plain matmuls, so they distribute the
classical SPMD way; this module lays them out over a 1-D mesh axis:

  LAYOUT (per device, b = n/P):
    * K0 (mode-0 Gram): ROW-SHARDED (b, n) — built from (x_local, x_full),
      the full n x n Gram never materializes on any chip;
    * y: row-sharded on the data axis (b, d_1..d_M);
    * A (eigenvalue tensor) and T1 (rotated y): row-sharded on the
      mode-0 EIGEN axis (b, d_1..d_M) — the memory-dominant objects
      (134 MB at n=1024/(32,32,32)) scale as O(n D / P);
    * V (mode-0 eigenbasis), B (Rayleigh-Ritz matrix): REPLICATED (n, n)
      — the tracked basis is carried across steps and every device needs
      all of it for its GEMM slabs.  Memory model: O(n^2) replicated
      basis + O(n^2/P + nD/P) sharded slabs (the basis fits to n~32k;
      the time win, not the basis memory, is what this path buys);
    * mode m>=1 Grams/eigenpairs: replicated (d_m x d_m, trivial).

  Every n^3-class GEMM becomes n^3/P local compute + one O(n^2) psum:
    C = A_rowsharded @ B_replicated          -> local, no comm
    C = sum_k A[k,:]^T B[k,:] (k sharded)    -> psum of local (n, n)

  The scheduled FULL eigh refresh runs on the all-gathered Gram,
  replicated on every device ("compute on gathered shards once per
  refresh") — at large n the shipping large-n mode is PURE TRACKING
  (refresh only at step 0; BASELINE.md "the refresh wall falls"), so
  the replicated eigh costs one step per run, and the per-step program
  is fully distributed.

  COMMUNICATION VOLUME per tracked NLML+grad step (f32 words):
    forward:  1 psum n^2   (Rayleigh-Ritz B)
              per sweep: 3 psums n^2 (Newton-Schulz G) +
                         2 psums n^2 (B rotation) + 1 psum n^2 (V update)
              1 psum_scatter nD (mode-0 rotation of y)
    backward: 1 psum nD (H = V G assembly) + 1 psum_scatter nD (dy)
              1 all_gather n (w0) + small per-mode psums (d_m, d_m^2)
    total  ~= (1 + 6*sweeps) n^2 + 3 nD words
  against O(n^3)/P + O(n^2 D)/P per-device compute — compute-bound for
  n >> ~7P * (bytes/s)/(flops/s), riding ICI when the axis maps to a
  physical ring.  (At n=4096, D=4096, P=8: ~7.5e8 words = 3.0 GB/step
  aggregate vs ~1.2e11 flops/device.)

No reference counterpart exists (SURVEY §2.8: single-process torch);
value/grad parity vs the unsharded `ops/kron.py:tracked_kron_nlml` is
pinned by tests/test_kron_nsharded.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fidelityfusion_tpu.ops.kron import rank1_tucker, multi_mode_dot, _clamp_psd
from fidelityfusion_tpu.ops.spectral import _MAX_S_NORM

_PR = lax.Precision.HIGHEST
LOG2PI = math.log(2.0 * math.pi)


def _rows(my, b):
    return my * b


def _psum_rowcontract(A_local, B_local, axis):
    """sum_k A[k, :]^T B[k, :] over the sharded row axis -> replicated."""
    return lax.psum(
        jnp.matmul(A_local.T, B_local, precision=_PR), axis
    )


def _jacobi_refine_sharded(K_local, V, axis, nblk, b, sweeps=1):
    """`ops/spectral.py:jacobi_refine` with every n^3 GEMM distributed
    over ``axis``.  ``K_local``: (b, n) row block; ``V``: replicated
    (n, n).  Returns (w, V', res), all replicated."""
    my = lax.axis_index(axis)
    n = V.shape[0]
    r0 = my * b
    # B = V^T K V: M = K V (row-sharded), then contract the sharded rows
    M_local = jnp.matmul(K_local, V, precision=_PR)  # (b, n)
    V_myrows = lax.dynamic_slice_in_dim(V, r0, b, axis=0)
    B = _psum_rowcontract(V_myrows, M_local, axis)  # (n, n) replicated

    I_local = lax.dynamic_slice_in_dim(jnp.eye(n, dtype=V.dtype), r0, b, 0)

    for _ in range(sweeps):
        # exact 2x2 tangent (replicated elementwise; O(n^2) VPU work)
        d = jnp.diagonal(B)
        E = B - jnp.diag(d)
        diff = d[None, :] - d[:, None]
        sgn = jnp.where(diff >= 0, 1.0, -1.0).astype(B.dtype)
        denom = jnp.abs(diff) + jnp.sqrt(diff * diff + 4.0 * E * E)
        t = jnp.where(denom > 0, 2.0 * E * sgn / jnp.maximum(denom, 1e-30), 0.0)
        t = jnp.triu(t, 1)
        t = t - t.T
        s_norm = jnp.sqrt(jnp.sum(t * t))
        t = t * jnp.minimum(1.0, _MAX_S_NORM / jnp.maximum(s_norm, 1e-30))
        # Q = I + t, row-sharded; Newton-Schulz with distributed GEMMs
        Q_local = I_local + lax.dynamic_slice_in_dim(t, r0, b, 0)
        I_full = jnp.eye(n, dtype=V.dtype)
        for _ns in range(3):
            G = lax.psum(
                jnp.matmul(Q_local.T, Q_local, precision=_PR), axis
            )
            Q_local = jnp.matmul(
                Q_local, 1.5 * I_full - 0.5 * G, precision=_PR
            )
        # B <- Q^T B Q;  V <- V Q   (contractions over Q's sharded rows:
        # (X @ Q)[i, j] = sum_k X[i, k] Q[k, j] -> COLUMN-slice X at the
        # local k-block and psum the partials)
        B_myrows = lax.dynamic_slice_in_dim(B, r0, b, 0)
        QtB = _psum_rowcontract(Q_local, B_myrows, axis)  # (n, n)
        B = lax.psum(
            jnp.matmul(
                lax.dynamic_slice_in_dim(QtB, r0, b, 1), Q_local,
                precision=_PR,
            ),
            axis,
        )
        V = lax.psum(
            jnp.matmul(
                lax.dynamic_slice_in_dim(V, r0, b, 1), Q_local,
                precision=_PR,
            ),
            axis,
        )

    w = jnp.diagonal(B)
    off = B - jnp.diag(w)
    res = jnp.sqrt(jnp.sum(off * off)) / jnp.maximum(
        jnp.sqrt(jnp.sum(B * B)), 1e-30
    )
    return w, V, res


def _tracked_eigh_sharded(K_local, V_prev, step, axis, nblk, b,
                          refresh_every, sweeps):
    """`ops/spectral.py:tracked_eigh` over the mesh: the scheduled
    refresh pays one replicated eigh of the ALL-GATHERED Gram (once per
    refresh window; pure-tracking mode pays it at step 0 only), tracked
    steps run the distributed Jacobi refinement."""
    n = V_prev.shape[0]

    def refresh(_):
        K_full = lax.all_gather(K_local, axis).reshape(n, n)
        w, V = jnp.linalg.eigh(K_full)
        return w, V, jnp.zeros((), K_local.dtype)

    def track(_):
        return _jacobi_refine_sharded(
            K_local, V_prev, axis, nblk, b, sweeps=sweeps
        )

    return lax.cond(
        (jnp.asarray(step) % refresh_every) == 0, refresh, track,
        operand=None,
    )


@lru_cache(maxsize=None)
def _tracked_kron_nlml_rowsharded(refresh_every: int, sweeps: int,
                                  axis: str, nblk: int, b: int):
    """Row-sharded `ops/kron.py:tracked_kron_nlml` — call INSIDE a
    shard_map over mesh axis ``axis``.

    ``f(K0_local, K_modes, y_local, noise, V_prev, step)
        -> (loss_partial, V_new, res)``

    ``loss_partial`` is this device's (1,)-shaped partial of the
    element-normalized Kronecker NLML: the caller MUST reduce the
    partials with a plain sum OUTSIDE the shard_map (out_specs along
    ``axis``) so every partial receives the same upstream cotangent —
    the closed-form VJP (same math as `ops/kron.py:_kron_nlml_bwd`,
    re-expressed blockwise) is the gradient of the TOTAL and is exact
    only under that uniform-cotangent contract (see
    `parallel/nsharded.py:mvn_nll_rowsharded`).

    Gradient contract per input: dK0_local is the EXACT row block (K0 is
    a sharded input); dK_modes / dnoise are PARTIALS that shard_map's
    transpose psums into the true replicated-input gradients (they are
    linear in the per-device contraction partials, so no internal psum
    is needed); dy_local is the exact row block; V_prev and step carry
    zero gradients (the tracked basis is a constant of the step, exactly
    as in the unsharded custom VJP).
    """

    @jax.custom_vjp
    def f(K0_local, K_modes, y_local, noise, V_prev, step):
        out, _ = f_fwd(K0_local, K_modes, y_local, noise, V_prev, step)
        return out

    def f_fwd(K0_local, K_modes, y_local, noise, V_prev, step):
        my = lax.axis_index(axis)
        r0 = my * b
        n = V_prev.shape[0]

        lam0, V, res = _tracked_eigh_sharded(
            K0_local, V_prev, step, axis, nblk, b, refresh_every, sweeps
        )
        eigvals, eigvecs = [lam0], [V]
        for K in K_modes:
            lam, Vm = jnp.linalg.eigh(K)
            eigvals.append(lam)
            eigvecs.append(Vm)
        eigvals = _clamp_psd(eigvals)

        # A, T1 row-sharded over the mode-0 EIGEN axis
        lam0_local = lax.dynamic_slice_in_dim(eigvals[0], r0, b, 0)
        A_local = rank1_tucker([lam0_local] + eigvals[1:]) + noise

        y_flat = y_local.reshape(b, -1)  # (b, D) data rows
        # DATA mode-products run at DEFAULT matmul precision, exactly like
        # the unsharded path's tensordot chains (`ops/kron.py`); HIGHEST
        # is reserved for the eigenbasis-tracking GEMMs
        # (_jacobi_refine_sharded, matching ops/spectral.py) — pinning it
        # here cost a measured +180% single-chip overhead (the (n, D)
        # rotation alone is 2.2 ms at HIGHEST vs 0.5 at DEFAULT)
        C = jnp.matmul(
            lax.dynamic_slice_in_dim(V, r0, b, 0).T, y_flat
        )  # (n, D) partial of V^T y
        T1_flat = lax.psum_scatter(
            C, axis, scatter_dimension=0, tiled=True
        )  # (b, D): my eigen-block rows of V^T y
        T1_local = multi_mode_dot(
            T1_flat.reshape((b,) + y_local.shape[1:]),
            [Vm.T for Vm in eigvecs[1:]],
            modes=list(range(1, len(eigvecs))),
        )

        nd = float(n * np.prod(y_local.shape[1:]))
        quad_p = jnp.sum(T1_local**2 / A_local)
        logdet_p = jnp.sum(jnp.log(A_local))
        loss_p = 0.5 * (nd * LOG2PI / nblk + logdet_p + quad_p) / nd
        resid = (tuple(eigvals), tuple(eigvecs), A_local, T1_local, nd)
        return (loss_p[None], V, res), resid

    def f_bwd(resid, ts):
        t_loss_vec, _t_v, _t_res = ts
        t = t_loss_vec[0]
        eigvals, eigvecs, A_local, T1_local, nd = resid
        my = lax.axis_index(axis)
        r0 = my * b
        V = eigvecs[0]
        n = V.shape[0]
        M1 = len(eigvals)
        scale = t * 0.5 / nd

        U_local = 1.0 / A_local  # (b, d_1..d_M) eigen rows
        beta_local = T1_local * U_local
        sqrt_lams = [jnp.sqrt(jnp.maximum(lam, 0.0)) for lam in eigvals]
        lam0_local = lax.dynamic_slice_in_dim(eigvals[0], r0, b, 0)
        sq0_local = jnp.sqrt(jnp.maximum(lam0_local, 0.0))

        # ---- dK0 (exact row block over DATA rows) --------------------
        # dK0 = scale * (V diag(w0) V^T - H H^T), H = V @ unfold0(gamma0)
        others = list(range(1, M1))
        w0_local = multi_mode_dot(
            U_local, [eigvals[j].reshape(1, -1) for j in others],
            modes=others,
        ).reshape(b)
        w0 = lax.all_gather(w0_local, axis).reshape(n)
        gamma0_local = beta_local * rank1_tucker(
            [jnp.ones_like(sq0_local)] + sqrt_lams[1:]
        )
        G0_local = gamma0_local.reshape(b, -1)  # (b, D) eigen rows
        H = lax.psum(
            jnp.matmul(
                lax.dynamic_slice_in_dim(V, r0, b, 1), G0_local,
            ),
            axis,
        )  # (n, D) replicated: V @ G0 contracted over G0's sharded rows
        V_myrows = lax.dynamic_slice_in_dim(V, r0, b, 0)
        H_myrows = lax.dynamic_slice_in_dim(H, r0, b, 0)
        dK0_local = scale * (
            jnp.matmul(V_myrows * w0[None, :], V.T)
            - jnp.matmul(H_myrows, H.T)
        )

        # ---- dK_m, m >= 1 (PARTIALS; shard_map transpose psums) ------
        dKms = []
        for m in range(1, M1):
            others_m = [j for j in range(1, M1) if j != m]
            # contract U over mode 0 (lam0-WEIGHTED sum over the local
            # eigen rows) and the other small modes -> (d_m,) partial
            lam0_b = lam0_local.reshape((b,) + (1,) * (U_local.ndim - 1))
            Um = jnp.sum(lam0_b * U_local, axis=0, keepdims=True)
            wm = multi_mode_dot(
                Um, [eigvals[j].reshape(1, -1) for j in others_m],
                modes=others_m,
            ).reshape(-1)  # (d_m,) partial (mode-0 part summed locally)
            gamma_m = beta_local * rank1_tucker(
                [sq0_local]
                + [
                    sqrt_lams[j] if j != m else jnp.ones_like(sqrt_lams[j])
                    for j in range(1, M1)
                ]
            )
            Gm = jnp.moveaxis(gamma_m, m, 0).reshape(gamma_m.shape[m], -1)
            Bm = jnp.matmul(Gm, Gm.T)  # (d_m, d_m) partial
            Vm = eigvecs[m]
            dKms.append(
                scale * (
                    jnp.matmul(Vm * wm[None, :], Vm.T)
                    - Vm @ (Bm @ Vm.T)
                )
            )

        # ---- dy (exact row block over DATA rows) ---------------------
        beta_rot = multi_mode_dot(
            beta_local, list(eigvecs[1:]), modes=list(range(1, M1))
        ).reshape(b, -1)
        Cy = jnp.matmul(
            lax.dynamic_slice_in_dim(V, r0, b, 1), beta_rot
        )  # (n, D) partial of V beta over beta's sharded eigen rows
        dy_flat = lax.psum_scatter(Cy, axis, scatter_dimension=0, tiled=True)
        dy_local = (t / nd) * dy_flat.reshape(A_local.shape)

        # ---- dnoise (partial) ----------------------------------------
        dnoise = scale * (jnp.sum(U_local) - jnp.sum(beta_local**2))

        return (
            dK0_local,
            tuple(dKms),
            dy_local,
            jnp.asarray(dnoise, A_local.dtype),
            jnp.zeros_like(V),
            jnp.zeros((), V.dtype),
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def hogp_nll_tracked_nsharded(
    hogp,
    params,
    aux,
    step,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mesh: Mesh,
    axis: str = "n",
    refresh_every: int = 64,
    sweeps: int = 1,
    y_var: Optional[jnp.ndarray] = None,
    residual=None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """`models/hogp.py:nll_tracked` with the TRAINING-SET axis sharded
    over ``mesh[axis]`` — same value/grad contract (threaded through
    `train/fit.py:adam_scan_aux`), but no device ever materializes the
    full n x n Gram slab of the A/T1 tensors (module docstring: layout +
    communication volume).  ``aux = (V_prev, max_res)`` with V_prev the
    REPLICATED tracked eigenbasis.

    Large-n usage: set ``refresh_every`` above the run length (pure
    tracking — BASELINE.md records 512-step parity) so the only
    replicated-eigh step is the bootstrap.

    ``residual``: optional ``(tl, y_low, y_high, shift, scale)`` — the
    GAR residual-stage target ``(Y_hi - TL(Y_lo) - shift)/scale``
    (`models/gar.py:_GarResLossTracked`), built from ROW SLABS inside
    the sharded program (TensorLinear acts on the non-row modes, so the
    lift is row-local — zero extra collectives) with the TensorLinear
    params trained through the loss.  ``params`` is then
    ``{"hogp": ..., "tl": ...}`` and ``y`` is ignored.
    """
    n = x.shape[0]
    nblk = int(mesh.shape[axis])
    if n % nblk:
        raise ValueError(f"n={n} not divisible by mesh axis size {nblk}")
    b = n // nblk
    V_prev, max_res = aux
    if residual is not None:
        tl, yl_r, yh_r, shift, scale = residual
        yspec = P(axis, *([None] * (yh_r.ndim - 1)))
        y_in = (
            jax.device_put(yl_r, NamedSharding(
                mesh, P(axis, *([None] * (yl_r.ndim - 1))))),
            jax.device_put(yh_r, NamedSharding(mesh, yspec)),
        )
        yspec_tree = (P(axis, *([None] * (yl_r.ndim - 1))), yspec)
        hp = params["hogp"]
    else:
        yspec = P(axis, *([None] * (y.ndim - 1)))
        y_in = jax.device_put(y, NamedSharding(mesh, yspec))
        yspec_tree = yspec
        hp = params

    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    yv = (jax.device_put(y_var, NamedSharding(mesh, P(axis)))
          if y_var is not None else None)

    kernel = hogp.kernel
    grids = hogp.grids(hp)
    jitter = hogp.jitter
    fn_core = _tracked_kron_nlml_rowsharded(
        int(refresh_every), int(sweeps), axis, nblk, b
    )

    def local(params, V_prev, step, x_local, y_local, yv_local):
        my = lax.axis_index(axis)
        if residual is not None:
            hp_l = params["hogp"]
            yl_local, yh_local = y_local
            y_use = (yh_local - tl.apply(params["tl"], yl_local)
                     - shift) / scale
        else:
            hp_l = params
            y_use = y_local
        kp = hp_l["kernel"]
        x_full = lax.all_gather(x_local, axis).reshape(n, x_local.shape[1])
        K0_local = kernel.apply(kp, x_local, x_full)
        rows = jnp.arange(b)
        cols = my * b + rows
        extra = jnp.full((b,), jitter, K0_local.dtype)
        if yv_local is not None:
            extra = extra + yv_local
        K0_local = K0_local.at[rows, cols].add(extra)
        K_modes = tuple(kernel.apply(kp, g, g) for g in grids)
        noise = 1.0 / hp_l["noise_variance"][0]
        loss_p, V_new, res = fn_core(
            K0_local, K_modes, y_use, noise, V_prev, step
        )
        return loss_p, V_new, res

    in_specs = (P(), P(), P(), P(axis, None), yspec_tree,
                P(axis) if yv is not None else P())
    fn = jax.shard_map(
        lambda p, v, s, a, c, vv: local(
            p, v, s, a, c, vv if y_var is not None else None
        ),
        mesh=mesh, in_specs=in_specs, out_specs=(P(axis), P(), P()),
        check_vma=False,
    )
    dummy = yv if yv is not None else jnp.zeros((), jnp.float32)
    loss_p, V_new, res = fn(
        params, V_prev, jnp.asarray(step), xs, y_in, dummy
    )
    return jnp.sum(loss_p), (V_new, jnp.maximum(max_res, res))


def fit_hogp_nsharded(
    hogp,
    params,
    x,
    y,
    mesh: Mesh,
    steps: int = 200,
    lr: float = 1e-2,
    axis: str = "n",
    refresh_every: Optional[int] = None,
    sweeps: int = 1,
    y_var=None,
    residual=None,
):
    """One-call n-axis-sharded HOGP training: the aux-carry Adam scan
    (`train/fit.py:adam_scan_aux` — NaN last-good rollback included)
    over `hogp_nll_tracked_nsharded`.

        mesh = make_n_mesh()
        params, losses, aux = fit_hogp_nsharded(hogp, p0, x, y, mesh)

    ``refresh_every`` defaults to PURE TRACKING (one replicated eigh at
    step 0, GEMM-only distributed steps after — the documented large-n
    mode; pass e.g. 64 for the bounded-staleness schedule).  Returns
    ``(good_params, losses, (V, max_res))``.
    """
    import optax

    from fidelityfusion_tpu.train.fit import adam_scan_aux

    if refresh_every is None:
        refresh_every = max(steps + 1, 2)  # pure tracking

    def loss_fn(p, aux, step):
        return hogp_nll_tracked_nsharded(
            hogp, p, aux, step, x, y, mesh, axis=axis,
            refresh_every=refresh_every, sweeps=sweeps, y_var=y_var,
            residual=residual,
        )

    aux0 = hogp.tracking_aux0(x.shape[0])
    _, good, losses, aux = adam_scan_aux(
        loss_fn, params, aux0, optax.adam(lr), steps
    )
    return good, losses, aux
