"""CLI smoke-test demo: train any model end-to-end from the command line.

TPU-native re-design of the reference's canonical entry point
(`MFGP_ver2023May/mfgp_demo.py:48-138`, documented at `README.md:62-70`):

    python -m fidelityfusion_tpu.demo <MODEL> [--iters N] [--lr F] [--cpu]

MODEL in {AR, NAR, ResGP, CAR, CAR_large, CIGAR, GAR, CIGP, HOGP, FIDES}.
Vector models run on the seeded 3-fidelity toy sin; tensor models (GAR,
HOGP) on generated multi-fidelity Poisson fields (the reference's sample
npy files are absent from its snapshot — SURVEY.md §2.7).  Prints final
r2/rmse/nll/nrmse.

``--nonsubset`` draws each fidelity's inputs independently (non-nested
designs) and trains AR/NAR/ResGP through the imputation path — the
equivalent of `MFGP_ver2023May/mfgp_nonsubset_demo.py:1-131`.
"""

from __future__ import annotations

import argparse
import time


def _toy_3fid(seed=1, nonsubset=False):
    import numpy as np

    rng = np.random.default_rng(seed)
    if nonsubset:
        # independent per-fidelity draws: no fidelity's x-set nests in
        # another (`mfgp_nonsubset_demo.py` protocol)
        xs = [np.sort(rng.random((n, 1)) * 20, axis=0)
              for n in (300, 200, 150)]
    else:
        x_all = rng.random((500, 1)) * 20
        pick = lambda n: x_all[np.sort(rng.permutation(500)[:n])]
        xs = [pick(300), pick(300), pick(250)]
    noise = lambda n: rng.random((n, 1)) * 0.1 - 0.05
    ys = [
        np.sin(xs[0]) - 0.5 * np.sin(2 * xs[0]) + noise(len(xs[0])),
        np.sin(xs[1]) - 0.3 * np.sin(2 * xs[1]) + noise(len(xs[1])),
        np.sin(xs[2]) + noise(len(xs[2])),
    ]
    x_test = np.linspace(0, 20, 100).reshape(-1, 1)
    return xs, ys, x_test, np.sin(x_test)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "model",
        choices=["AR", "NAR", "ResGP", "CAR", "CAR_large", "CIGAR", "GAR",
                 "CIGP", "HOGP", "FIDES"],
    )
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--lr", type=float, default=5e-2)
    parser.add_argument("--restarts", type=int, default=4)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument(
        "--nonsubset", action="store_true",
        help="non-nested fidelity designs + imputation training "
             "(AR/NAR/ResGP; mfgp_nonsubset_demo equivalent)",
    )
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from fidelityfusion_tpu.experiments.metrics import calculate_metrix
    from fidelityfusion_tpu.models.data_manager import MultiFidelityDataManager
    from fidelityfusion_tpu.ops.kernels import ARDKernel, SquaredExponentialKernel

    t0 = time.time()
    name = args.model

    if name in ("GAR", "HOGP", "CIGAR"):
        from fidelityfusion_tpu.data.pde import generate_poisson_mf_dataset

        x, ys_fields = generate_poisson_mf_dataset(
            n_samples=64, resolutions=(8, 12, 16), d_in=4, seed=0
        )
        n_tr = 48
        if name == "HOGP":
            from fidelityfusion_tpu.models.hogp import HOGP
            from fidelityfusion_tpu.train.fit import fit

            y = ys_fields[-1]
            ym, ysd = y.mean(), y.std()
            xm, xsd = x.mean(0), x.std(0)
            xn = (x - xm) / xsd
            yn = (y - ym) / ysd
            hogp = HOGP(kernel=ARDKernel(), output_shape=y.shape[1:])
            params = hogp.init_params(x.shape[1])
            xj = jnp.asarray(xn[:n_tr], jnp.float32)
            yj = jnp.asarray(yn[:n_tr], jnp.float32)
            res = fit(lambda p: hogp.nll(p, xj, yj), params,
                      steps=args.iters, lr=args.lr)
            _, state = hogp.nll_with_state(res.params, xj, yj)
            mean, var = hogp.predict(
                res.params, state, xj, jnp.asarray(xn[n_tr:], jnp.float32)
            )
            mean = np.asarray(mean) * ysd + ym
            var = np.asarray(var) * ysd**2
            m = calculate_metrix(y[n_tr:], mean, var)
        else:
            from fidelityfusion_tpu.models.cigar import CIGAR, train_CIGAR
            from fidelityfusion_tpu.models.gar import GAR, train_GAR

            shapes = [f.shape[1:] for f in ys_fields]
            ys_use = (
                [f.reshape(len(f), -1) for f in ys_fields]
                if name == "CIGAR"
                else ys_fields
            )
            dm = MultiFidelityDataManager(
                [
                    {"raw_fidelity_name": str(i), "fidelity_indicator": i,
                     "X": x[:n_tr], "Y": y[:n_tr]}
                    for i, y in enumerate(ys_use)
                ]
            )
            if name == "GAR":
                model = GAR(3, [ARDKernel()] * 3, shapes, input_dim=x.shape[1])
                train_GAR(model, dm, max_iter=args.iters, lr_init=args.lr,
                          n_restarts=args.restarts)
            else:
                model = CIGAR(3, [ARDKernel()] * 3, shapes, input_dim=x.shape[1])
                train_CIGAR(model, dm, max_iter=args.iters, lr_init=args.lr,
                            n_restarts=args.restarts)
            mean, var = model.forward(dm, jnp.asarray(x[n_tr:], jnp.float32))
            m = calculate_metrix(
                np.asarray(ys_use[-1][n_tr:]), np.asarray(mean), np.asarray(var)
            )
    elif name in ("CIGP", "FIDES"):
        xs, ys, x_test, y_test = _toy_3fid()
        xm, xsd = xs[-1].mean(), xs[-1].std()
        ym, ysd = ys[-1].mean(), ys[-1].std()
        xn = jnp.asarray((xs[-1] - xm) / xsd, jnp.float32)
        yn = jnp.asarray((ys[-1] - ym) / ysd, jnp.float32)
        xt = jnp.asarray((x_test - xm) / xsd, jnp.float32)
        from fidelityfusion_tpu.train.fit import fit

        if name == "CIGP":
            from fidelityfusion_tpu.models.cigp import CIGP

            gp = CIGP(kernel=SquaredExponentialKernel())
            params = gp.init_params(1)
            res = fit(lambda p: gp.nll(p, xn, yn), params,
                      steps=args.iters, lr=args.lr)
            mean, cov = gp.predict(res.params, xn, yn, xt)
            var = np.diagonal(np.asarray(cov))
        else:
            from fidelityfusion_tpu.models.fides import FIDES, FidelityBounds

            fides = FIDES()
            params = fides.init_params(1)
            bounds = FidelityBounds(0.0, 1.0, 0.0, 1.0)
            res = fit(lambda p: fides.nll(p, xn, yn, bounds), params,
                      steps=args.iters, lr=args.lr)
            mean, var = fides.predict(res.params, xn, yn, xt, bounds)
            var = np.asarray(var).ravel()
        mean = np.asarray(mean) * ysd + ym
        var = np.asarray(var) * ysd**2
        m = calculate_metrix(y_test, mean, var)
    else:
        from fidelityfusion_tpu.models.ar import AR, train_AR
        from fidelityfusion_tpu.models.car import (
            ContinuousAutoRegression,
            ContinuousAutoRegressionLarge,
            train_CAR,
            train_CAR_large,
        )
        from fidelityfusion_tpu.models.nar import NAR, train_NAR
        from fidelityfusion_tpu.models.resgp import ResGP, train_ResGP

        nonsub = bool(args.nonsubset)
        if nonsub and name not in ("AR", "NAR", "ResGP"):
            parser.error("--nonsubset supports AR/NAR/ResGP")
        xs, ys, x_test, y_test = _toy_3fid(nonsubset=nonsub)
        dm = MultiFidelityDataManager(
            [
                {"raw_fidelity_name": str(i), "fidelity_indicator": i,
                 "X": x, "Y": y}
                for i, (x, y) in enumerate(zip(xs, ys))
            ]
        )
        kernels = [SquaredExponentialKernel() for _ in range(3)]
        if name == "AR":
            model = AR(3, kernels, input_dim=1, if_nonsubset=nonsub)
            train_AR(model, dm, max_iter=args.iters, lr_init=args.lr,
                     n_restarts=args.restarts)
        elif name == "NAR":
            model = NAR(3, kernels, input_dim=1, if_nonsubset=nonsub)
            train_NAR(model, dm, max_iter=args.iters, lr_init=args.lr,
                      n_restarts=args.restarts)
        elif name == "ResGP":
            model = ResGP(3, kernels, input_dim=1, if_nonsubset=nonsub)
            train_ResGP(model, dm, max_iter=args.iters, lr_init=args.lr,
                        n_restarts=args.restarts)
        elif name == "CAR":
            model = ContinuousAutoRegression(3, [ARDKernel()] * 3, input_dim=1)
            train_CAR(model, dm, max_iter=args.iters, lr_init=args.lr,
                      n_restarts=args.restarts)
        else:  # CAR_large
            model = ContinuousAutoRegressionLarge(3, ARDKernel(), input_dim=1)
            train_CAR_large(model, dm, max_iter=args.iters, lr_init=args.lr)
        mean, cov = model.forward(dm, jnp.asarray(x_test, jnp.float32))
        cov = np.asarray(cov)
        var = np.diagonal(cov) if cov.ndim == 2 else cov
        m = calculate_metrix(y_test, np.asarray(mean), var)

    m = {k: round(float(v), 5) for k, v in m.items()}
    print(f"{name}: {m} ({time.time()-t0:.1f}s)")
    return m


if __name__ == "__main__":
    main()
