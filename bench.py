"""Benchmark harness: NLML-training throughput + dense-linalg speed of light.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: NLML+grad+Adam training steps/s at n=1024 f32 — the hot loop of
every model in the framework (ARD Gram -> jittered Cholesky -> triangular
solve -> logdet -> reverse-mode grad -> Adam), fully jit-scanned.
``vs_baseline`` compares against the reference PyTorch-CPU implementation
measured on the same problem (re-run of `GaussianProcess/cigp_v10.py`'s
train loop; recorded fallback otherwise).

Robustness: the tunneled single-chip TPU in this environment can wedge for
tens of minutes if any client is killed mid-operation, so every device
stage runs in its OWN subprocess with a faulthandler watchdog (stack dump
+ clean exit on stall) and a parent-side timeout; a stalled stage falls
back to the most recent recorded measurement (flagged on stderr) so the
headline JSON is always produced.

Timing methodology: each kernel is timed as the DIFFERENCE between a long
and a short `lax.scan` chain inside one jitted call with a scalar output —
this cancels dispatch/transfer overhead, which dominates naive per-call
timing over the tunnel (naive timing here is ~50x pessimistic).
"""

import json
import os
import subprocess
import sys
import time

# Most recent DRIVER-captured on-chip measurements (TPU v5e, this host;
# BENCH_r04.json), used as fallback when a stage cannot run.  Policy since
# round 3: fallbacks are synced to the latest driver capture, never to
# builder-side best-case runs (the round-1/2 claim-drift failure mode).
RECORDED = {
    "nlml300": 5388.8,        # steps/s (driver r4)
    "nlml1024": 1602.3,       # steps/s (driver r4)
    "nlml4096": 54.5,         # steps/s (driver r4)
    "nlml1024_fused": 2781.0,  # steps/s (driver r4, se-analytic)
    "nlml4096_fused": 206.6,   # steps/s (driver r4, se-analytic; 91% of
                               # the measured-primitive bound, BASELINE.md)
    "restarts": 2752.2,       # aggregate steps/s, R=32 n=1024 (driver r4)
    "chol4096": 11.05,        # TFLOP/s (driver r4, XLA)
    "gram4096": 0.15,         # ms (driver r4, XLA ARD gram, full-precision
                              # cross term — bf16 grams are indefinite)
    "hogp128": 2141.1,        # steps/s, n=128 (32,32) fields (driver r4)
    "hogp1024": 203.15,       # steps/s, n=1024 (32,32,32) fields; SHIPPING
                              # tracked-spectrum path, refresh_every=64
                              # schedule (driver r4; exact path was 17.7
                              # driver r2).
    "eigh1024": 54.75,        # ms, one 1024x1024 symmetric eigh with the
                              # eigenvectors USED (driver r4; the r2 9.67 ms
                              # came from a vectors-DCEd variant)
    "modedot1024": 0.89,      # ms, (1024,32,32,32) mode-dot chain (driver r4)
}
REF_STEPS_PER_S_N1024 = 16.1  # torch-CPU measured (BASELINE.md)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------------------------------- stage code
def _se_params():
    """CIGP+SE params built in PURE numpy: creating them with jnp puts
    them on the device and fetching them back (np.asarray) is the exact
    call the tunnel intermittently deadlocks on right after client init."""
    import numpy as np

    return {
        "kernel": {
            "length_scale": np.ones(1, np.float32),
            "signal_variance": np.ones(1, np.float32),
        },
        "log_beta": np.ones(1, np.float32),
    }


def _ard_params(d):
    import numpy as np

    return {
        "length_scales": np.ones(d, np.float32),
        "signal_variance": np.ones(1, np.float32),
    }


def _watchdog(seconds=420):
    import faulthandler

    faulthandler.dump_traceback_later(seconds, exit=True)


def _chain_time(make_fn, L1, L2, reps=5):
    """Median-of-``reps`` chain-difference per-step time.

    Each rep produces one independent (t_long - t_short)/(L2 - L1)
    estimate; the MEDIAN is reported and the min/max spread is logged so
    point claims carry their variance (round-2 verdict: single-shot
    numbers over the noisy tunnel drifted between builder and driver
    captures)."""
    f1, f2 = make_fn(L1), make_fn(L2)
    float(f1())
    float(f2())

    def once(f):
        t0 = time.time()
        float(f())
        return time.time() - t0

    diffs = sorted(
        (once(f2) - once(f1)) / (L2 - L1) for _ in range(reps)
    )
    med = diffs[len(diffs) // 2]
    log(f"[spread] per-step s: median {med:.3e} "
        f"min {diffs[0]:.3e} max {diffs[-1]:.3e} (n={reps})")
    return med


def stage_nlml(n: int):
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rng = np.random.default_rng(0)
    # keep all closed-over arrays HOST-side (numpy): device-resident
    # constants must be fetched back during jit lowering, which
    # intermittently deadlocks over the tunneled TPU transport
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    # fused_nll=False: this stage measures the AUTODIFF-through-Cholesky
    # baseline (the fused custom-VJP default is the *_fused stage)
    gp = CIGP(kernel=SquaredExponentialKernel(), fused_nll=False)
    p0 = _se_params()
    opt = optax.adam(1e-2)

    def mk(L):
        def fn():
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(lambda pp: gp.nll(pp, x, y))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(body, (p0, opt.init(p0)), None, length=L)
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    L1, L2 = (3, 23) if n >= 4096 else (10, 110)
    per = _chain_time(mk, L1, L2)
    return 1.0 / per


def stage_nlml_fused(n: int):
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    gp = CIGP(kernel=SquaredExponentialKernel(), fused_nll=True)
    p0 = _se_params()
    opt = optax.adam(1e-2)

    def mk(L):
        def fn():
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(lambda pp: gp.nll(pp, x, y))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(body, (p0, opt.init(p0)), None, length=L)
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    L1, L2 = (3, 23) if n >= 4096 else (10, 110)
    per = _chain_time(mk, L1, L2)
    return 1.0 / per


def stage_restarts():
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from fidelityfusion_tpu.models.cigp import CIGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    n, R = 1024, 32
    rng = np.random.default_rng(0)
    x = (rng.random((n, 1)) * 20).astype(np.float32)
    y = np.sin(x)
    # the production restart path (models/ar.py:_blocked_variant) swaps in
    # the GEMM-only batched NLML at this scale — measure what ships
    gp = CIGP(kernel=SquaredExponentialKernel(), blocked_nll=True)
    p0 = _se_params()
    batch = jax.tree_util.tree_map(
        lambda a: np.stack([a + 0.01 * i for i in range(R)]), p0
    )
    opt = optax.adam(1e-2)

    def mk(L):
        def single(p_init):
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(lambda pp: gp.nll(pp, x, y))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(
                body, (p_init, opt.init(p_init)), None, length=L
            )
            return jnp.sum(losses)

        def fn():
            return jnp.sum(jax.vmap(single)(batch)) * 1e-6

        return jax.jit(fn)

    per = _chain_time(mk, 5, 30)
    return R / per


def stage_chol():
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp

    nc = 4096
    rng = np.random.default_rng(0)
    A = rng.random((nc, 64)).astype(np.float32)
    K = A @ A.T + nc * np.eye(nc, dtype=np.float32)  # host-side

    def mk(L):
        def fn():
            def body(c, _):
                Lc = jnp.linalg.cholesky(K + (c * 1e-9) * jnp.eye(nc))
                return jnp.sum(Lc) * 1e-9, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    per = _chain_time(mk, 2, 12)
    return (nc**3 / 3.0) / per / 1e12


def stage_gram():
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fidelityfusion_tpu.ops.kernels import ARDKernel

    xg = np.random.default_rng(0).random((4096, 8)).astype(np.float32)
    ard = ARDKernel()
    ap = _ard_params(8)

    def mk(L):
        def fn():
            def body(c, _):
                G = ard.apply(ap, xg + c * 1e-12, xg)
                return jnp.sum(G) * 1e-12, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    per = _chain_time(mk, 2, 12)
    return per * 1e3


def _hogp_setup(n, shape):
    import numpy as np

    from fidelityfusion_tpu.models.hogp import HOGP
    from fidelityfusion_tpu.ops.kernels import SquaredExponentialKernel

    rng = np.random.default_rng(0)
    x = rng.random((n, 4)).astype(np.float32)
    base = np.sin(2 * np.pi * x.sum(axis=1)).astype(np.float32)
    pattern = rng.random(shape).astype(np.float32)
    y = base.reshape((n,) + (1,) * len(shape)) * pattern  # (n, *shape)
    hogp = HOGP(kernel=SquaredExponentialKernel(), output_shape=shape)
    p0 = {
        "kernel": {
            "length_scale": np.ones(1, np.float32),
            "signal_variance": np.ones(1, np.float32),
        },
        "noise_variance": np.ones(1, np.float32),
    }
    return hogp, p0, x, y


def stage_hogp(n: int, shape):
    """HOGP NLML+grad+Adam steps/s — the GAR/Kronecker hot path
    (`GaussianProcess/hogp_simple.py:73-113`): per-mode eigh + A tensor +
    multi-mode-dot chains instead of a dense n*prod(d) Cholesky.

    For n >= 512 this measures the SHIPPING training path: warm-started
    spectral tracking (`models/hogp.py:nll_tracked` via
    `train/fit.py:adam_scan_aux`, refresh_every=64 — the round-4
    schedule, BASELINE.md "tracked-spectrum schedule frontier") —
    XLA:TPU's serial QDWH eigh is ~48 of the 51 ms exact step at n=1024
    (scripts/profile_hogp.py), and the tracked path replaces it with MXU
    Jacobi sweeps between scheduled refreshes.  The chain window (2, 66)
    spans steps [2, 66) and so includes exactly ONE refresh (step 64) per
    64 steps — the number is AMORTIZED, not best-tracked-step."""
    _watchdog(420)
    import jax
    import jax.numpy as jnp
    import optax

    hogp, p0, x, y = _hogp_setup(n, shape)
    opt = optax.adam(1e-2)

    if n >= 512:
        import numpy as np

        from fidelityfusion_tpu.train.fit import adam_scan_aux

        # host-side aux0 (device constants deadlock the tunnel at lowering)
        aux0 = (np.eye(n, dtype=np.float32), np.zeros((), np.float32))

        def mk(L):
            def fn():
                def lt(pp, aux, t):
                    return hogp.nll_tracked(pp, aux, t, x, y, refresh_every=64)

                _, _, losses, _ = adam_scan_aux(lt, p0, aux0, opt, L)
                return jnp.sum(losses) * 1e-6

            return jax.jit(fn)

        per = _chain_time(mk, 2, 66)
        return 1.0 / per

    def mk(L):
        def fn():
            def body(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(lambda pp: hogp.nll(pp, x, y))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), loss

            (_, _), losses = jax.lax.scan(body, (p0, opt.init(p0)), None, length=L)
            return jnp.sum(losses) * 1e-6

        return jax.jit(fn)

    L1, L2 = (2, 10) if n >= 1024 else (5, 55)
    per = _chain_time(mk, L1, L2)
    return 1.0 / per


def stage_eigh(n: int = 1024):
    """Isolated symmetric eigendecomposition (the HOGP mode-0 factor) on a
    REALISTIC SE Gram.  The round-2 fixture (rank-64 + n*I) hit the QDWH
    divide-and-conquer's nearly-diagonal early exit — after deflating 64
    directions every sub-block is a perfect eigenvalue cluster — and
    measured 9.67 ms; a real SE Gram's continuous spectrum forces the
    full recursion (~48 ms, scripts/measure_eigh_quick.py), which is what
    HOGP training actually pays (and what the tracked-spectrum path,
    `ops/spectral.py`, avoids)."""
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xs = (rng.random((n, 1)) * 10).astype(np.float32)
    K = np.exp(-0.5 * (xs - xs.T) ** 2).astype(np.float32) + 1e-3 * np.eye(
        n, dtype=np.float32
    )

    def mk(L):
        def fn():
            def body(c, _):
                lam, V = jnp.linalg.eigh(K + (c * 1e-9) * jnp.eye(n))
                return jnp.sum(lam) * 1e-9 + jnp.sum(V) * 1e-12, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    per = _chain_time(mk, 1, 5)
    return per * 1e3


def stage_modedot(n: int = 1024, shape=(32, 32, 32)):
    """The HOGP solve chain: multi_mode_dot of a (n, *shape) tensor with
    the per-mode eigenvector matrices (forward rotation T1), timed alone —
    pure batched GEMMs, should sit at the MXU roofline."""
    _watchdog(420)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fidelityfusion_tpu.ops.kron import multi_mode_dot

    rng = np.random.default_rng(0)
    y = rng.random((n,) + tuple(shape)).astype(np.float32)
    mats = [np.linalg.qr(rng.random((d, d)))[0].astype(np.float32)
            for d in (n,) + tuple(shape)]

    def mk(L):
        def fn():
            def body(c, _):
                t = multi_mode_dot(y + c * 1e-12, mats)
                return jnp.sum(t) * 1e-12, ()

            out, _ = jax.lax.scan(body, 0.0, None, length=L)
            return out

        return jax.jit(fn)

    per = _chain_time(mk, 2, 12)
    return per * 1e3


def stage_ref():
    try:
        sys.path.insert(0, "/root/reference")
        import torch
        import GaussianProcess.kernel as rkernel
        from GaussianProcess.cigp_v10 import cigp

        n = 1024
        torch.manual_seed(0)
        x = torch.rand(n, 1) * 20
        y = torch.sin(x)
        model = cigp(kernel=rkernel.SquaredExponentialKernel(), log_beta=1.0)
        opt = torch.optim.Adam(model.parameters(), lr=1e-2)
        for _ in range(3):
            opt.zero_grad()
            loss = -model.negative_log_likelihood(x, y)
            loss.backward()
            opt.step()
        iters = 30
        t0 = time.time()
        for _ in range(iters):
            opt.zero_grad()
            loss = -model.negative_log_likelihood(x, y)
            loss.backward()
            opt.step()
        return iters / (time.time() - t0)
    except Exception:
        return REF_STEPS_PER_S_N1024


STAGES = {
    "nlml300": lambda: stage_nlml(300),
    "nlml1024": lambda: stage_nlml(1024),
    "nlml4096": lambda: stage_nlml(4096),
    "nlml1024_fused": lambda: stage_nlml_fused(1024),
    "nlml4096_fused": lambda: stage_nlml_fused(4096),
    "restarts": stage_restarts,
    "chol4096": stage_chol,
    "gram4096": stage_gram,
    "hogp128": lambda: stage_hogp(128, (32, 32)),
    "hogp1024": lambda: stage_hogp(1024, (32, 32, 32)),
    "eigh1024": stage_eigh,
    "modedot1024": stage_modedot,
    "ref": stage_ref,
}


def run_stage_subprocess(name: str, timeout: int = 480, retries: int = 1):
    """Run one stage isolated; returns (value, live) where live=False means
    the recorded fallback was used.  The remote device claim takes a few
    seconds to hand over between client processes, so each stage waits
    before starting and retries once on failure."""
    for attempt in range(retries + 1):
        time.sleep(10 if attempt == 0 else 60)  # claim handover settle
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                capture_output=True,
                text=True,
                timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("STAGE_RESULT "):
                    return float(line.split()[2]), True
            log(f"[stage {name}] attempt {attempt}: no result "
                f"(rc={proc.returncode}); stderr tail: {proc.stderr[-1500:]}")
        except subprocess.TimeoutExpired:
            log(f"[stage {name}] attempt {attempt}: TIMED OUT after {timeout}s")
        except Exception as e:  # pragma: no cover
            log(f"[stage {name}] attempt {attempt} failed: {e}")
    return RECORDED.get(name, float("nan")), False


PROBE_CODE = (
    "import jax, jax.numpy as jnp; print(float(jnp.zeros(())) + 1.0)"
)


def wait_device_ready(max_tries: int = 10, probe_timeout: int = 45) -> bool:
    """Gate on the device actually answering: the tunneled chip's first
    post-claim fetch can hang when another client exited recently.  A
    killed PROBE only waits on the claim (holds nothing), so timing it out
    is safe; two consecutive successes = settled."""
    streak = 0
    for i in range(max_tries):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", PROBE_CODE],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if proc.returncode == 0 and "1.0" in proc.stdout:
                streak += 1
                if streak >= 2:
                    return True
                time.sleep(5)
                continue
        except subprocess.TimeoutExpired:
            pass
        streak = 0
        log(f"[probe] device not ready (try {i + 1}/{max_tries})")
        time.sleep(20)
    return False


def run_monolithic(timeout: int = 1500):
    """All stages under one device claim; returns {name: value}."""
    out = {}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--monolithic"],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("STAGE_RESULT "):
                _, name, val = line.split()
                out[name] = float(val)
        if proc.returncode != 0 and not out:
            log(f"[mono] rc={proc.returncode}; stderr tail: {proc.stderr[-800:]}")
    except subprocess.TimeoutExpired as e:
        for line in (e.stdout or "").splitlines():
            if line.startswith("STAGE_RESULT "):
                _, name, val = line.split()
                out[name] = float(val)
        log("[mono] timed out; keeping partial results")
    return out


STAGE_ORDER = (
    "nlml300", "nlml1024", "nlml4096", "nlml1024_fused", "nlml4096_fused",
    "restarts", "chol4096", "gram4096",
    "hogp128", "hogp1024", "eigh1024", "modedot1024",
)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        name = sys.argv[2]
        val = STAGES[name]()
        print(f"STAGE_RESULT {name} {val}", flush=True)
        return

    if len(sys.argv) >= 2 and sys.argv[1] == "--monolithic":
        # all device stages under ONE claim: the tunneled device's
        # claim handover between processes is slow/flaky, so a single
        # process is the reliable path.  Watchdog re-armed per stage.
        for name in STAGE_ORDER:
            _watchdog(240)
            try:
                val = STAGES[name]()
                print(f"STAGE_RESULT {name} {val}", flush=True)
            except Exception as e:  # keep going; parent fills fallbacks
                print(f"STAGE_FAIL {name} {e!r}", file=sys.stderr, flush=True)
        return

    results = {}
    units = {
        "nlml300": "steps/s", "nlml1024": "steps/s", "nlml4096": "steps/s",
        "nlml1024_fused": "steps/s", "nlml4096_fused": "steps/s",
        "restarts": "agg steps/s", "chol4096": "TFLOP/s", "gram4096": "ms",
        "hogp128": "steps/s", "hogp1024": "steps/s",
        "eigh1024": "ms", "modedot1024": "ms",
    }
    if not wait_device_ready():
        # Advisory only: the r4 driver run had a probe that never settled
        # while every monolithic stage then ran live — the probe's short
        # per-try timeout can miss a slow first compile.  The REAL guard
        # against silent recorded fallbacks is the retry pass below.
        log("[probe] device never settled; proceeding — fallback stages "
            "will be retried and reported loudly")
    mono = run_monolithic()
    fallback_stages = []
    for name in STAGE_ORDER:
        if name in mono:
            results[name] = mono[name]
            log(f"[bench] {name}: {mono[name]:.2f} {units[name]}")
            continue
        val, live = run_stage_subprocess(name)
        results[name] = val
        if not live:
            fallback_stages.append(name)
        log(f"[bench] {name}: {val:.2f} {units[name]}"
            + ("" if live else " (RECORDED FALLBACK)"))
    if fallback_stages:
        # One more monolithic pass after a cooldown: a wedged tunnel claim
        # usually clears within minutes; never leave fallbacks silent.
        log(f"[bench] RETRYING fallback stages after cooldown: "
            f"{fallback_stages}")
        time.sleep(120)
        retry = run_monolithic()
        still = []
        for name in fallback_stages:
            if name in retry:
                results[name] = retry[name]
                log(f"[bench] {name}: {retry[name]:.2f} {units[name]} "
                    f"(retry, live)")
            else:
                still.append(name)
        if still:
            log(f"[bench] FALLBACK_STAGES (recorded, NOT live): {still}")

    ref, ref_live = run_stage_subprocess("ref", timeout=120, retries=0)
    if not ref_live:
        ref = REF_STEPS_PER_S_N1024
    # fairness guard: host-CPU contention (e.g. a concurrent sweep) can
    # depress the torch reference; compare against its best measurement
    ref = max(ref, REF_STEPS_PER_S_N1024)
    log(f"[ref] torch-CPU n=1024: {ref:.1f} steps/s")

    # headline = the production-default path (fused custom-VJP NLML)
    headline = results.get("nlml1024_fused") or results["nlml1024"]
    print(
        json.dumps(
            {
                "metric": "nlml_grad_adam_steps_per_s_n1024",
                "value": round(float(headline), 1),
                "unit": "steps/s",
                "vs_baseline": round(float(headline) / ref, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
