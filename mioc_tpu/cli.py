"""Command-line driver: solve a predefined problem with the TRM.

Re-design of ``main`` (``/root/reference/multi-trust.jl:179-206``) with the
reference's per-problem solver presets.  Usage::

    python -m mioc_tpu.cli fishing --n 1024
    python -m mioc_tpu.cli heat --n 500 --no-plot --metrics out.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from .models import registry


def build_objective(problem: str, n: int):
    """Instantiate a registered problem (built-in or plugin-discovered)."""
    try:
        return registry.build(problem, nt=n)
    except KeyError as exc:
        raise SystemExit(str(exc.args[0]))


def _ensure_backend():
    """Fall back to an available JAX backend when ``JAX_PLATFORMS`` pins a
    plugin that was never registered (e.g. the axon TPU tunnel with
    ``PALLAS_AXON_POOL_IPS=`` set to skip it)."""
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


def main(argv=None):
    _ensure_backend()
    # Plugin-style problem discovery (multi-trust.jl:15-20): import every
    # example_*.py on $MIOC_PROBLEMS_PATH (default: the working directory).
    registry.discover()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("problem", nargs="?", default="fishing",
                    choices=registry.available())
    ap.add_argument("--n", type=int, default=1024, help="number of time steps")
    ap.add_argument("--seed", type=int, default=None, help="x0 RNG seed")
    ap.add_argument("--julia-start", action="store_true",
                    help="generate x0 from a bit-exact replica of the "
                         "reference's seeded MersenneTwister stream "
                         "(requires --seed; reproduces a seeded reference "
                         "run's random start bit-for-bit)")
    ap.add_argument("--beta", type=float, default=None)
    ap.add_argument("--delta0", type=float, default=None)
    ap.add_argument("--p", type=float, default=None)
    ap.add_argument("--maxiter", type=int, default=1000)
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--no-log", action="store_true")
    ap.add_argument("--metrics", default=None, help="jsonl metrics path")
    ap.add_argument("--checkpoint", default=None, help="npz checkpoint path")
    ap.add_argument("--multistart", type=int, default=1,
                    help="number of random restarts (best result kept)")
    ap.add_argument("--device-loop", action="store_true",
                    help="run the whole TRM inside one jit (no per-step host "
                         "sync; batches multistart with vmap)")
    ap.add_argument("--dp-backend", default=None,
                    choices=["scan", "pallas", "temporal", "sharded"],
                    help="DP subproblem engine for the host loop (default: "
                         "auto — fused Pallas kernels on TPU, XLA scan "
                         "elsewhere; 'sharded' partitions the contraction "
                         "over the device mesh's level axis, 'temporal' "
                         "parallelizes the time axis)")
    ap.add_argument("--speculative", dest="speculative", default=None,
                    action="store_true",
                    help="device loop: evaluate the whole trust-region "
                         "halving schedule as one batched trial wave per "
                         "outer iteration (default: per-objective measured "
                         "policy — on for ODE/dense-PDE single solves and "
                         "PDE multistarts; trajectories bit-match the "
                         "sequential loop)")
    ap.add_argument("--no-speculative", dest="speculative",
                    action="store_false")
    ap.add_argument("--device-chunk", type=int, default=None,
                    help="segment the device loop into dispatches of N outer "
                         "iterations (bounds single-dispatch runtime for "
                         "large PDE solves; exact; default: adaptive; "
                         "0 forces one monolithic dispatch)")
    args = ap.parse_args(argv)

    from .solvers.trm import TRMParameters, trm_solve

    preset = dict(registry.get(args.problem).preset)
    for key in ("beta", "delta0", "p"):
        if getattr(args, key) is not None:
            preset[key] = getattr(args, key)
    par = TRMParameters(
        **preset,
        maxiter=args.maxiter,
        log=not args.no_log,
        metrics_path=args.metrics,
        checkpoint_path=args.checkpoint,
        dp_backend=args.dp_backend,
    )

    def _julia_x0(obj, start: int = 0):
        """x0 from the reference's seeded MersenneTwister stream (or None
        when --julia-start is off; per-start seeds offset like the numpy
        multistart path)."""
        if not args.julia_start:
            return None
        if args.seed is None:
            ap.error("--julia-start requires --seed")
        from .utils.init import rand_func as _rf

        return _rf(obj, seed=args.seed + start, julia_stream=True)

    t0 = time.time()
    if args.problem == "mixed":
        from .solvers.mixed import MixedParameters, mixed_solve

        obj = build_objective(args.problem, args.n)
        mres = mixed_solve(obj, MixedParameters(trm=par), x0=_julia_x0(obj),
                           seed=args.seed)
        wall = time.time() - t0
        print(f"{wall:.3f} seconds")
        print(f"Objective Value: J = {mres.J}")
        print(json.dumps({
            "problem": "mixed", "n": args.n, "J": mres.J,
            "rounds": mres.rounds, "converged": mres.converged,
            "wall_s": round(wall, 3),
        }))
        if not args.no_plot:
            from .utils.plotting import plot_results

            print(f"plot saved to {plot_results(obj)}")
        return 0
    if args.device_loop:
        import numpy as _np

        from .solvers.trm_device import multistart_solve_device, trm_solve_device
        from .utils.init import rand_func

        obj = build_objective(args.problem, args.n)
        if args.multistart > 1:
            import jax

            x0s = _np.stack(
                [_julia_x0(obj, s) if args.julia_start
                 else rand_func(obj, seed=(args.seed or 0) + s)
                 for s in range(args.multistart)]
            )
            mesh = None
            if jax.device_count() > 1 and args.multistart % jax.device_count() == 0:
                from .parallel import make_device_mesh

                mesh = make_device_mesh(batch=jax.device_count())
            batch = multistart_solve_device(obj, par, x0s, mesh=mesh,
                                            speculative=args.speculative)
            best = int(_np.argmin(batch.J))
            dev = type(batch)(*[leaf[best] for leaf in batch])
        else:
            # --device-chunk: absent → adaptive, 0 → monolithic, N → fixed.
            chunk = ("auto" if args.device_chunk is None
                     else args.device_chunk or None)
            prog = None
            if not args.no_log:
                prog = lambda it, s: print(
                    f"  device loop: {it} outer iterations ({s:.1f} s segment)")
            dev = trm_solve_device(obj, par, x0=_julia_x0(obj), seed=args.seed,
                                   outer_chunk=chunk, progress=prog,
                                   speculative=args.speculative)
        from .solvers.trm import TRMResult

        res = TRMResult(
            J=float(dev.J), u=_np.asarray(dev.u), x_final=_np.asarray(dev.x_final),
            converged=bool(dev.converged), iterations=int(dev.iterations),
            inner_steps=int(dev.inner_steps), f_evals=int(dev.f_evals),
            df_evals=int(dev.df_evals), tv=float(dev.tv), f=float(dev.f),
            dp_builds=int(dev.dp_builds), timings={},
        )
        obj.x = dev.x_final  # for plotting parity with the reference
        obj.eval_fdf_()
    elif args.multistart > 1:
        from .parallel import multistart_solve

        x0s = None
        if args.julia_start:
            import numpy as _np

            _obj = build_objective(args.problem, args.n)
            x0s = _np.stack([_julia_x0(_obj, s) for s in range(args.multistart)])
        res, _ = multistart_solve(
            lambda: build_objective(args.problem, args.n),
            args.multistart, par, seed=args.seed or 0, x0s=x0s,
        )
        obj = None
    else:
        obj = build_objective(args.problem, args.n)
        res = trm_solve(obj, par, x0=_julia_x0(obj), seed=args.seed)
    wall = time.time() - t0

    print(f"{wall:.3f} seconds")
    print(f"Objective Value: J = {res.J}")
    print(json.dumps({
        "problem": args.problem, "n": args.n, "J": res.J,
        "iterations": res.iterations, "f_evals": res.f_evals,
        "df_evals": res.df_evals, "converged": res.converged,
        "wall_s": round(wall, 3),
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }))

    if not args.no_plot and obj is not None:
        from .utils.plotting import plot_results

        out = plot_results(obj)
        print(f"plot saved to {out}")
        from .objectives.pde import PDEObjective

        if isinstance(obj, PDEObjective):
            from .utils.plotting import animate_solution

            print("Animating solution, this could take a few seconds")
            out = animate_solution(
                obj.mesh, np.asarray(obj.state).T, obj.tau,
                v=np.asarray(res.u),
            )
            print(f"animation saved to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
