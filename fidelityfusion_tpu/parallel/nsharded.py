"""n-axis sharded NLML: distributed Gram + blocked Cholesky over the mesh.

The one distributed capability the embarrassingly-parallel axes
(`parallel/mesh.py`: restarts / candidates / prediction rows) do not
cover is the TRAINING-SET axis itself — the reference's hot path
(`GaussianProcess/cigp_v10.py:61-68`: Gram -> Cholesky -> solves ->
logdet) is bounded by one device's HBM and O(n^3) time.  SURVEY §5.7-5.8
names distributed Gram/Cholesky with psum-reduced NLML as this workload's
honest "sequence parallelism" analog; this module implements it as a
`shard_map` program over a 1-D mesh axis:

  * every device owns a contiguous ROW BLOCK of the Gram/Cholesky factor
    (b = n/P rows) — K_local is built from ``(x_local, x_full)`` so the
    full n x n Gram is never materialized on any chip;
  * the factorization is the right-looking blocked Cholesky of
    `ops/blocked.py` laid out across devices: per panel j the (replicated,
    cheap) b x b diagonal-block factor/inverse comes from a masked psum,
    the panel solve is a local GEMM against inv(L_jj), and the trailing
    Schur update is a local GEMM against the all-gathered panel column;
  * NLML terms reduce with psum; the closed-form VJP (same math as
    `ops/blocked.py:_nll_blocked_bwd`: dSigma = 0.5*(d*K^-1 - alpha
    alpha^T)) computes its row block of K^{-1} via a distributed
    triangular inverse + psum-contracted W^T W, so backward memory is
    also O(n^2 / P) per device.

Communication volume per NLML+grad step (f32 words, 1-D axis of P
devices, b = n/P):

  forward:  P masked psums of b^2 (diag blocks)      = n*b
            P all-gathers of b^2 panels              = n*b
            P masked psums of b*d (fwd substitution) = n*d
  backward: P psums of b*d (bwd substitution)        = n*d
            P psums of b*n (tri-inverse broadcast)   = n^2
            P psums of b*n (K^-1 row contraction)    = n^2
  total  ~= 2*n^2 + 2*n*(b + d)  words  (~33.6 MB at n=2048, d=1, P=8)

i.e. the collectives are O(n^2) while the compute is O(n^3)/P per device
— the program is compute-bound for n >> P * (words/s) / (flops/s), and
rides ICI when the axis maps to a physical ring.

This is a CAPABILITY path (train n beyond one chip), not a single-chip
speed record: on one device the same program pays its collective overhead
with no parallel win — measured overhead vs the unsharded hybrid path is
recorded in BASELINE.md ("n-axis sharding").

No reference counterpart exists (SURVEY §2.8: the reference is
single-process, single-device).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG2PI = math.log(2.0 * math.pi)


def _solve_lower(Ljj, B):
    return jax.scipy.linalg.solve_triangular(Ljj, B, lower=True)


def _dist_chol(A_local, axis, nblk, b):
    """Distributed right-looking blocked Cholesky.

    ``A_local``: this device's (b, n) row block of SPD A.  Returns
    ``L_local`` (b, n) row block of the lower factor, ``Wd`` (nblk, b, b)
    replicated per-panel inv(L_jj), ``Ljj`` (nblk, b, b) replicated
    diagonal factors, and the replicated logdet scalar.
    """
    my = lax.axis_index(axis)
    zero_bb = jnp.zeros((b, b), A_local.dtype)
    L_local = jnp.zeros_like(A_local)
    logdet = jnp.zeros((), A_local.dtype)
    Wd_list, Ljj_list = [], []
    eye_b = jnp.eye(b, dtype=A_local.dtype)
    for j in range(nblk):
        cols = slice(j * b, (j + 1) * b)
        # panel-j diagonal block lives on device j: masked psum replicates
        Dj = lax.psum(jnp.where(my == j, A_local[:, cols], zero_bb), axis)
        Ljj = jnp.linalg.cholesky(Dj)
        Wjj = _solve_lower(Ljj, eye_b)
        logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ljj)))
        # panel solve: device i > j gets L_ij = A_ij @ inv(L_jj)^T (GEMM)
        panel = A_local[:, cols] @ Wjj.T
        panel = jnp.where(my == j, Ljj, jnp.where(my > j, panel, zero_bb))
        L_local = L_local.at[:, cols].set(panel)
        # trailing Schur update needs the whole panel column
        Lcol = lax.all_gather(panel, axis).reshape(nblk * b, b)
        upd = panel @ Lcol.T  # (b, n)
        A_local = A_local - jnp.where(my > j, upd, jnp.zeros_like(upd))
        Wd_list.append(Wjj)
        Ljj_list.append(Ljj)
    return L_local, jnp.stack(Wd_list), jnp.stack(Ljj_list), logdet


def _dist_forward_solve(L_local, Ljj, y_local, axis, nblk, b):
    """z = L^{-1} y by blocked forward substitution; returns all z blocks
    (nblk, b, d), replicated (they are small)."""
    my = lax.axis_index(axis)
    acc = y_local
    zero = jnp.zeros_like(y_local)
    zs = []
    for j in range(nblk):
        accj = lax.psum(jnp.where(my == j, acc, zero), axis)
        zj = _solve_lower(Ljj[j], accj)
        zs.append(zj)
        acc = acc - L_local[:, j * b:(j + 1) * b] @ zj
    return jnp.stack(zs)


def _dist_backward_solve(L_local, Ljj, zs, axis, nblk, b):
    """alpha = L^{-T} z by blocked backward substitution (reverse order);
    returns (nblk, b, d) replicated."""
    my = lax.axis_index(axis)
    alphas = [None] * nblk
    alpha_my = jnp.zeros_like(zs[0])
    zero = jnp.zeros_like(zs[0])
    for j in reversed(range(nblk)):
        own = L_local[:, j * b:(j + 1) * b].T @ alpha_my
        contrib = lax.psum(jnp.where(my > j, own, zero), axis)
        aj = jax.scipy.linalg.solve_triangular(
            Ljj[j].T, zs[j] - contrib, lower=False
        )
        alphas[j] = aj
        alpha_my = jnp.where(my == j, aj, alpha_my)
    return jnp.stack(alphas)


def _dist_tri_inv(L_local, Wd, axis, nblk, b):
    """W = inv(L) row-sharded: device k's row block is finalized at step k
    from the psum-broadcast previous rows; O(n^2/P) memory per device."""
    my = lax.axis_index(axis)
    n = L_local.shape[1]
    S = jnp.zeros_like(L_local)  # running sum_{j<k} L_kj @ W_j  (b, n)
    W_local = jnp.zeros_like(L_local)
    for k in range(nblk):
        mine = -Wd[k] @ S  # S only has nonzero cols < k*b
        mine = mine.at[:, k * b:(k + 1) * b].set(Wd[k])
        W_local = jnp.where(my == k, mine, W_local)
        Wk = lax.psum(
            jnp.where(my == k, W_local, jnp.zeros_like(W_local)), axis
        )
        S = S + L_local[:, k * b:(k + 1) * b] @ Wk
    return W_local


def _dist_kinv_rows(W_local, axis, nblk, b):
    """Row block of K^{-1} = W^T W: psum-contract over the sharded row
    axis of W, one (b, n) target block at a time (O(n^2/P) memory)."""
    my = lax.axis_index(axis)
    out = jnp.zeros_like(W_local)
    for i in range(nblk):
        Ci = lax.psum(W_local[:, i * b:(i + 1) * b].T @ W_local, axis)
        out = jnp.where(my == i, Ci, out)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def mvn_nll_rowsharded(Sigma_local, y_local, axis, nblk, b):
    """PER-DEVICE PARTIAL of the NLML of y ~ N(0, Sigma), with Sigma/y
    ROW-SHARDED over mesh axis ``axis`` (call INSIDE shard_map).

    The partials sum to `ops/linalg.mvn_nll`'s value; the caller MUST
    reduce them with a plain sum OUTSIDE the shard_map (out_specs along
    ``axis``), which guarantees every partial receives the SAME upstream
    cotangent — the closed-form VJP (`ops/blocked.py:_nll_blocked_bwd`:
    dSigma = 0.5*(d*K^-1 - alpha alpha^T)) is the gradient of the TOTAL
    and is exact only under that uniform-cotangent contract.  (Returning
    a replicated total instead would leave the cotangent scaling to
    shard_map's unchecked-replication transpose, which divides by P.)
    """
    val, _ = _nll_rowsharded_fwd(Sigma_local, y_local, axis, nblk, b)
    return val


def _nll_rowsharded_fwd(Sigma_local, y_local, axis, nblk, b):
    my = lax.axis_index(axis)
    d = y_local.shape[1]
    L_local, Wd, Ljj, _ = _dist_chol(Sigma_local, axis, nblk, b)
    zs = _dist_forward_solve(L_local, Ljj, y_local, axis, nblk, b)
    z_my = lax.dynamic_index_in_dim(zs, my, 0, keepdims=False)
    Ljj_my = lax.dynamic_index_in_dim(Ljj, my, 0, keepdims=False)
    val = (
        0.5 * jnp.sum(z_my**2)
        + d * jnp.sum(jnp.log(jnp.diagonal(Ljj_my)))
        + 0.5 * b * d * LOG2PI
    )
    return val, (L_local, Wd, Ljj, zs)


def _nll_rowsharded_bwd(axis, nblk, b, res, g):
    L_local, Wd, Ljj, zs = res
    my = lax.axis_index(axis)
    d = zs.shape[-1]
    alphas = _dist_backward_solve(L_local, Ljj, zs, axis, nblk, b)
    W_local = _dist_tri_inv(L_local, Wd, axis, nblk, b)
    Kinv_rows = _dist_kinv_rows(W_local, axis, nblk, b)
    alpha_local = lax.dynamic_index_in_dim(alphas, my, 0, keepdims=False)
    alpha_flat = alphas.reshape(nblk * b, d)
    dSigma = g * 0.5 * (d * Kinv_rows - alpha_local @ alpha_flat.T)
    dy = g * alpha_local
    return dSigma, dy


mvn_nll_rowsharded.defvjp(_nll_rowsharded_fwd, _nll_rowsharded_bwd)


def _pad_rows(a, n_pad):
    """Zero-pad a row-major array to ``n_pad`` rows (pad appended at the
    END, so masking is the static predicate global_row < n_real)."""
    a = jnp.asarray(a, jnp.float32)
    pad = n_pad - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )


def _padded_n(n_real, nblk):
    return ((n_real + nblk - 1) // nblk) * nblk


def _assemble_local(gp, params, x_local, x_full, yv_local, my, b, n_real,
                    axis):
    """This device's masked (b, n_pad) row slab of Sigma (+ the noise).

    Padded rows/cols (global index >= n_real — padding is always appended)
    become identity rows: the blocked distributed Cholesky factors them to
    identity, contributing zero to quad/logdet, exactly the
    `ops/linalg.assemble_sigma` mask semantics.  The relative noise floor
    and diag-mean statistics use only the VALID rows."""
    n_pad = x_full.shape[0]
    K_local = gp.kernel.apply(params["kernel"], x_local, x_full)
    rows = jnp.arange(b)
    cols = my * b + rows
    valid_r = cols < n_real  # (b,)
    diag_local = K_local[rows, cols]
    diag_mean = lax.psum(
        jnp.sum(jnp.where(valid_r, diag_local, 0.0)), axis
    ) / n_real
    noise = gp.noise(params, diag_mean)
    jit_val = (gp.jitter * diag_mean if gp.relative_jitter
               else jnp.asarray(gp.jitter, K_local.dtype))
    extra = noise + jit_val
    if yv_local is not None:
        extra = extra + yv_local[:, 0]
    if n_pad != n_real:
        valid_c = jnp.arange(n_pad) < n_real
        K_local = K_local * (valid_r[:, None] & valid_c[None, :]).astype(
            K_local.dtype
        )
        diag_vals = jnp.where(valid_r, diag_local + extra, 1.0)
        Sigma_local = K_local.at[rows, cols].set(diag_vals)
    else:
        Sigma_local = K_local.at[rows, cols].add(extra)
    return Sigma_local, noise


def cigp_nll_nsharded(gp, params, x, y, mesh: Mesh, axis: str = "n",
                      y_var: Optional[jnp.ndarray] = None):
    """CIGP NLML with the TRAINING-SET axis sharded over ``mesh[axis]``.

    Semantically identical to ``gp.nll(params, x, y)`` (same noise floor,
    jitter policy and value/grad contract — `models/cigp.py:_sigma`), but
    no device ever holds more than an (n/P, n) slab of the Gram or
    factor.  ``x``/``y`` may be unsharded host arrays; they are placed
    row-sharded here.  Arbitrary n: rows are zero-padded to a multiple of
    P and masked (identity rows of Sigma — exactly-equivalent NLML, same
    semantics as the pad buckets of `models/ar.py:pad_with_mask`).
    Differentiable wrt ``params`` (replicated; shard_map inserts the psum
    of the per-device cotangents).
    """
    n_real = x.shape[0]
    nblk = int(mesh.shape[axis])
    n = _padded_n(n_real, nblk)
    b = n // nblk
    y2 = y if y.ndim == 2 else y[:, None]
    d_out = y2.shape[1]
    if y_var is not None and y_var.ndim == 1:
        y_var = y_var[:, None]
    x_p, y_p = _pad_rows(x, n), _pad_rows(y2, n)
    yv_p = _pad_rows(y_var, n) if y_var is not None else None

    xs = jax.device_put(x_p, NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(y_p, NamedSharding(mesh, P(axis, None)))
    yv = (jax.device_put(yv_p, NamedSharding(mesh, P(axis, None)))
          if yv_p is not None else None)

    def local(params, x_local, y_local, yv_local):
        my = lax.axis_index(axis)
        x_full = lax.all_gather(x_local, axis).reshape(n, x_local.shape[1])
        Sigma_local, _ = _assemble_local(
            gp, params, x_local, x_full, yv_local, my, b, n_real, axis
        )
        # (1,)-shaped per-device partial; summed OUTSIDE the shard_map so
        # every partial receives the same cotangent (see
        # mvn_nll_rowsharded's contract)
        return mvn_nll_rowsharded(Sigma_local, y_local, axis, nblk, b)[None]

    in_specs = (P(), P(axis, None), P(axis, None),
                P(axis, None) if yv is not None else P())
    fn = jax.shard_map(
        lambda p, a, c, v: local(p, a, c, v if y_var is not None else None),
        mesh=mesh, in_specs=in_specs, out_specs=P(axis), check_vma=False,
    )
    dummy = yv if yv is not None else jnp.zeros((), y2.dtype)
    total = jnp.sum(fn(params, xs, ys, dummy))
    if n != n_real:
        # each padded identity row contributed 0.5*d*log(2 pi) of pure
        # constant through the per-device partials — remove it
        total = total - 0.5 * (n - n_real) * d_out * LOG2PI
    return total


def cigp_posterior_nsharded(gp, params, x, y, x_test, mesh: Mesh,
                            axis: str = "n",
                            y_var: Optional[jnp.ndarray] = None):
    """CIGP posterior mean + diagonal variance with the TRAINING-SET axis
    sharded over ``mesh[axis]`` — the serving half of the n-axis story:
    a model whose Gram never fits one chip can PREDICT across the mesh
    too.  Semantically identical to ``gp.predict_diag(params, x, y,
    x_test)`` (`ops/linalg.py:posterior_diag` + the noise term); x_test
    is replicated (test rows are the `parallel/mesh.py` axis — compose
    the two meshes for both).

    Per-call collectives: the blocked Cholesky's O(n*b) psums/gathers,
    one psum of b*m (forward substitution per panel), and one psum of
    the (m, d) mean — no O(n^2) term (no gradient path here).
    """
    n_real = x.shape[0]
    nblk = int(mesh.shape[axis])
    n = _padded_n(n_real, nblk)
    b = n // nblk
    y2 = y if y.ndim == 2 else y[:, None]
    if y_var is not None and y_var.ndim == 1:
        y_var = y_var[:, None]
    x_p, y_p = _pad_rows(x, n), _pad_rows(y2, n)
    yv_p = _pad_rows(y_var, n) if y_var is not None else None

    xs = jax.device_put(x_p, NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(y_p, NamedSharding(mesh, P(axis, None)))
    yv = (jax.device_put(yv_p, NamedSharding(mesh, P(axis, None)))
          if yv_p is not None else None)
    xt = jax.device_put(jnp.asarray(x_test, y2.dtype),
                        NamedSharding(mesh, P(None, None)))

    def local(params, x_local, y_local, xt, yv_local):
        my = lax.axis_index(axis)
        x_full = lax.all_gather(x_local, axis).reshape(n, x_local.shape[1])
        Sigma_local, noise = _assemble_local(
            gp, params, x_local, x_full, yv_local, my, b, n_real, axis
        )
        rows = jnp.arange(b)
        cols = my * b + rows
        valid_r = cols < n_real

        L_local, Wd, Ljj, _ = _dist_chol(Sigma_local, axis, nblk, b)
        zs_y = _dist_forward_solve(L_local, Ljj, y_local, axis, nblk, b)
        alphas = _dist_backward_solve(L_local, Ljj, zs_y, axis, nblk, b)
        alpha_local = lax.dynamic_index_in_dim(alphas, my, 0, keepdims=False)

        K_s_local = gp.kernel.apply(params["kernel"], x_local, xt)  # (b, m)
        # padded x rows are zeros but k(0, x_test) != 0 — zero their
        # cross-Gram rows so the identity-factor rows contribute nothing
        K_s_local = K_s_local * valid_r[:, None].astype(K_s_local.dtype)
        mean = lax.psum(K_s_local.T @ alpha_local, axis)  # (m, d)
        # v = L^{-1} K_s blockwise; zs_K replicated (nblk, b, m)
        zs_K = _dist_forward_solve(L_local, Ljj, K_s_local, axis, nblk, b)
        k_ss = gp.kernel.diag(params["kernel"], xt)
        explained = jnp.sum(zs_K.reshape(n, xt.shape[0]) ** 2, axis=0)
        var = jnp.maximum(k_ss - explained, 0.0) + noise
        return mean, var

    in_specs = (P(), P(axis, None), P(axis, None), P(None, None),
                P(axis, None) if yv is not None else P())
    fn = jax.shard_map(
        lambda p, a, c, t, v: local(p, a, c, t,
                                    v if y_var is not None else None),
        mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    dummy = yv if yv is not None else jnp.zeros((), y2.dtype)
    return fn(params, xs, ys, xt, dummy)


def make_n_mesh(n_devices: Optional[int] = None, axis: str = "n") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def fit_nsharded(gp, params, x, y, mesh: Mesh, steps: int = 200,
                 lr: float = 1e-2, axis: str = "n",
                 y_var: Optional[jnp.ndarray] = None):
    """One-call n-axis-sharded training: the framework Adam scan
    (`train/fit.py:adam_scan` — NaN last-good rollback included) over
    `cigp_nll_nsharded`, so "train n beyond one chip" is a single call:

        mesh = make_n_mesh()
        params, losses = fit_nsharded(gp, gp.init_params(d), x, y, mesh)

    Returns ``(good_params, losses)`` (the last verified-finite params,
    per `adam_scan`'s contract).  Same value/grad semantics as
    ``fit(gp.nll, ...)`` on one device (tests/test_nsharded.py)."""
    import optax

    from fidelityfusion_tpu.train.fit import adam_scan

    def loss_fn(p):
        return cigp_nll_nsharded(gp, p, x, y, mesh, axis=axis, y_var=y_var)

    _, good, losses = adam_scan(loss_fn, params, optax.adam(lr), steps)
    return good, losses


# --------------------------------------------------------------------------
# Restarts x n: the 2-D composition (round 5; VERDICT r4 weak #1b)
# --------------------------------------------------------------------------


def make_rn_mesh(n_r: int, n_n: Optional[int] = None,
                 r_axis: str = "r", n_axis: str = "n") -> Mesh:
    """2-D (restarts, n) mesh: ``n_r * n_n`` devices.  The restart axis is
    embarrassingly parallel (one argmin at the end); the n axis carries
    the distributed-factorization collectives — on hardware, map ``n`` to
    the ICI ring."""
    devs = jax.devices()
    if n_n is None:
        n_n = len(devs) // n_r
    devs = np.array(devs[: n_r * n_n]).reshape(n_r, n_n)
    return Mesh(devs, (r_axis, n_axis))


def restarts_nll_nsharded(gp, params_batch, x, y, mesh: Mesh,
                          n_axis: str = "n",
                          r_axis: Optional[str] = None,
                          y_var: Optional[jnp.ndarray] = None,
                          residual=None, lift=None):
    """Per-restart NLML vector (R,) with the training-set axis sharded
    over ``mesh[n_axis]`` and (optionally) the restart batch sharded over
    ``mesh[r_axis]`` — the restarts x n composition: the batched-Cholesky
    serialization that caps single-chip restart throughput (BASELINE.md
    "vmapped restarts") is sidestepped by giving each restart group its
    own n-sharded factorization row of the mesh.

    ``params_batch``: pytree with leading axis R on every leaf (R
    divisible by the r-axis size when sharded).  Differentiable: the sum
    of the returned vector is the joint restart loss (independent
    restarts — gradient of the sum is each restart's own gradient).
    Data (x/y) is REPLICATED across the r axis and row-sharded over n.

    ``residual``: optional ``(y_low, y_high, shift, scale)`` — the AR
    rho-residual stage target, rebuilt PER RESTART inside the sharded
    program so rho keeps its gradient path (the reference rebuilds the
    residual every iteration for the same reason,
    `AR_autoRegression.py:125-130`): each restart's params are
    ``{"gp": <cigp params>, "rho": scalar}`` and the stage target is
    ``(y_high - rho*y_low - shift)/scale`` built from row slabs
    (elementwise per row — no extra collectives).  ``y`` is ignored.

    ``lift``: optional `TensorLinear` spec — with ``residual`` set, the
    stage target becomes the CIGAR form ``(y_high - TL(y_low) - shift)
    / scale`` (flattened rows lifted through ``p["tl"]``, trained
    through the loss; the lift acts on output columns only, so it is
    row-local).
    """
    n_real = x.shape[0]
    nblk = int(mesh.shape[n_axis])
    n = _padded_n(n_real, nblk)
    b = n // nblk
    if residual is not None:
        yl_r, yh_r, shift, scale = residual
        yl2 = yl_r if yl_r.ndim == 2 else yl_r[:, None]
        yh2 = yh_r if yh_r.ndim == 2 else yh_r[:, None]
        y2 = yh2  # shape/d_out source
    else:
        y2 = y if y.ndim == 2 else y[:, None]
    d_out = y2.shape[1]
    if y_var is not None and y_var.ndim == 1:
        y_var = y_var[:, None]
    x_p = _pad_rows(x, n)
    if residual is not None:
        y_p = (_pad_rows(yl2, n), _pad_rows(yh2, n))
    else:
        y_p = _pad_rows(y2, n)
    yv_p = _pad_rows(y_var, n) if y_var is not None else None

    nspec = P(n_axis, None)
    xs = jax.device_put(x_p, NamedSharding(mesh, nspec))
    ys = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, nspec)), y_p
    )
    yv = (jax.device_put(yv_p, NamedSharding(mesh, nspec))
          if yv_p is not None else None)
    pspec = P(r_axis) if r_axis is not None else P()
    pb = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, pspec)), params_batch
    )

    def local(pb_local, x_local, y_local, yv_local):
        my = lax.axis_index(n_axis)
        x_full = lax.all_gather(x_local, n_axis).reshape(n, x_local.shape[1])

        def one(p):
            if residual is not None:
                yl_local, yh_local = y_local
                gp_p = p["gp"]
                if lift is not None:
                    b_rows = yl_local.shape[0]
                    lifted = lift.apply(
                        p["tl"],
                        yl_local.reshape((b_rows,) + lift.l_shape),
                    ).reshape(b_rows, -1)
                    tgt_local = (yh_local - lifted - shift) / scale
                else:
                    tgt_local = (
                        yh_local - p["rho"] * yl_local - shift
                    ) / scale
                if n != n_real:
                    # zero-padded yl/yh rows map to -shift/scale, not 0 —
                    # mask them so identity Sigma rows contribute nothing
                    valid = (my * b + jnp.arange(b)) < n_real
                    tgt_local = tgt_local * valid[:, None].astype(
                        tgt_local.dtype
                    )
            else:
                gp_p = p
                tgt_local = y_local
            Sigma_local, _ = _assemble_local(
                gp, gp_p, x_local, x_full, yv_local, my, b, n_real, n_axis
            )
            return mvn_nll_rowsharded(Sigma_local, tgt_local, n_axis, nblk, b)

        # vmap over the local restart group; the n-axis collectives
        # inside batch elementwise.  Output (R_local, 1): restart-sharded
        # rows, n-partial columns.
        return jax.vmap(one)(pb_local)[:, None]

    yspec_tree = (nspec, nspec) if residual is not None else nspec
    in_specs = (pspec, nspec, yspec_tree,
                nspec if yv is not None else P())
    out_spec = P(r_axis, n_axis) if r_axis is not None else P(None, n_axis)
    fn = jax.shard_map(
        lambda p, a, c, v: local(p, a, c, v if y_var is not None else None),
        mesh=mesh, in_specs=in_specs, out_specs=out_spec, check_vma=False,
    )
    dummy = yv if yv is not None else jnp.zeros((), y2.dtype)
    partials = fn(pb, xs, ys, dummy)  # (R, nblk)
    losses = jnp.sum(partials, axis=1)
    if n != n_real:
        losses = losses - 0.5 * (n - n_real) * d_out * LOG2PI
    return losses


def fit_restarts_nsharded(gp, params_batch, x, y, mesh: Mesh,
                          steps: int = 200, lr: float = 1e-2,
                          n_axis: str = "n",
                          r_axis: Optional[str] = None,
                          y_var: Optional[jnp.ndarray] = None,
                          residual=None, lift=None):
    """Restart-ladder training over the (restarts x n) mesh: one Adam
    scan advances every restart jointly (sum-of-NLMLs loss — restarts are
    independent, so each gets its own gradient), each restart's
    factorization running n-sharded; per-restart NaN rollback keeps the
    last verified-finite params (the `train/fit.py:fit_restarts`
    contract); the winner is the verified restart with the best final
    NLML.

        mesh = make_rn_mesh(2, 4)          # 8 devices: 2 restart rows
        best, losses = fit_restarts_nsharded(gp, batch, x, y, mesh,
                                             r_axis="r")

    Returns ``(best_params, per_restart_final_losses)``.
    """
    import optax

    opt = optax.adam(lr)

    def losses_fn(pbt):
        return restarts_nll_nsharded(
            gp, pbt, x, y, mesh, n_axis=n_axis, r_axis=r_axis, y_var=y_var,
            residual=residual, lift=lift,
        )

    def total_fn(pbt):
        ls = losses_fn(pbt)
        return jnp.sum(ls), ls

    def leaf_finite(a):
        return jnp.all(
            jnp.isfinite(a.reshape(a.shape[0], -1)), axis=1
        )

    def step_fn(carry, _):
        pbt, opt_state, good = carry
        (_, ls), grads = jax.value_and_grad(total_fn, has_aux=True)(pbt)
        updates, opt_state = opt.update(grads, opt_state, pbt)
        new_pbt = optax.apply_updates(pbt, updates)
        finite = jnp.isfinite(ls)
        for leaf in jax.tree_util.tree_leaves(updates):
            finite = finite & leaf_finite(leaf)
        good = jax.tree_util.tree_map(
            lambda g, npb: jnp.where(
                finite.reshape((-1,) + (1,) * (npb.ndim - 1)), npb, g
            ),
            good, new_pbt,
        )
        pbt = jax.tree_util.tree_map(
            lambda g, npb: jnp.where(
                finite.reshape((-1,) + (1,) * (npb.ndim - 1)), npb, g
            ),
            good, new_pbt,
        )
        return (pbt, opt_state, good), ls

    carry0 = (params_batch, opt.init(params_batch), params_batch)
    (pbt, _, good), _hist = lax.scan(step_fn, carry0, None, length=steps)
    final = losses_fn(good)
    # verified-finite selection: non-finite final losses lose
    final = jnp.where(jnp.isfinite(final), final, jnp.inf)
    best_i = jnp.argmin(final)
    best = jax.tree_util.tree_map(lambda a: a[best_i], good)
    return best, final
