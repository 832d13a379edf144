"""Command-line dataset generation (reference seam: main.py:307-427).

    python -m pl_fem_tpu.cli --n 500 --out ./dataset [--no-pml]
        [--scalar] [--cauchy] [--cmt-slices 5] [--seed 42] [--verbose]

Differences vs the reference CLI (documented, deliberate):
- samples come from the seeded stratified LHS (SmartSampler) instead of
  plain random draws (main.py:327-340), so runs are reproducible;
- records checkpoint incrementally to records.jsonl and runs resume
  after a crash (the reference writes CSV only at the end);
- the vectorial H-field solver is the default (use --scalar for the
  reference CLI's scalar pipeline).
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def setup_logger(level=logging.INFO, log_file=None):
    root = logging.getLogger("pl_fem_tpu")
    root.setLevel(level)
    root.handlers.clear()
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s",
                            datefmt="%H:%M:%S")
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    root.addHandler(console)
    if log_file:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root


def _parse_with_config(parser, argv):
    """Two-stage parse: --config file values become argument defaults
    (explicit command-line flags still win), and the file's
    ``simulation`` sub-dict is returned for SimulationConfig."""
    pre, _ = parser.parse_known_args(argv)
    sim_overrides = {}
    if pre.config:
        from .config import load_config_file

        data = load_config_file(pre.config)
        sim_overrides = data.pop("simulation", {}) or {}
        known = {a.dest for a in parser._actions}
        unknown = set(data) - known
        if unknown:
            parser.error(f"unknown config file keys: {sorted(unknown)}")
        parser.set_defaults(**data)
    return parser.parse_args(argv), sim_overrides


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate a photonic-lantern dataset "
                    "(modes + losses + CMT)")
    parser.add_argument("--n", type=int, default=20,
                        help="number of samples")
    parser.add_argument("--out", type=str, default="./dataset_pl")
    parser.add_argument("--no-pml", action="store_true", default=False)
    parser.add_argument("--scalar", action="store_true", default=False,
                        help="scalar Helmholtz instead of vectorial H-field")
    parser.add_argument("--cauchy", action="store_true", default=False,
                        help="IP-Dip Cauchy dispersion n(lambda)")
    parser.add_argument("--cmt-slices", type=int, default=0,
                        help=">=2 enables CMT over that many taper slices")
    parser.add_argument("--engine", choices=("serial", "sweep"),
                        default="sweep",
                        help="'sweep' batches designs through canonical-"
                             "grid packed sweeps (TPU-native scale-out); "
                             "'serial' is the reference-style per-design "
                             "loop. Scalar runs always use serial.")
    parser.add_argument("--quality-threshold", type=float, default=0.35)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--mesh-min-points", type=int, default=None)
    parser.add_argument("--no-resume", action="store_true", default=False)
    parser.add_argument("--adaptive-rounds", type=int, default=0,
                        help=">=2 runs the exploit/explore adaptive-"
                             "sampling loop over that many rounds "
                             "instead of one stratified LHS batch")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config file: top-level keys are CLI "
                             "defaults (n, out, engine, ...); the "
                             "'simulation' sub-dict maps onto "
                             "SimulationConfig/SolverConfig/MeshConfig "
                             "(reference seam: README.md:216)")
    parser.add_argument("--verbose", action="store_true")
    args, sim_overrides = _parse_with_config(parser, argv)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = setup_logger(
        logging.DEBUG if args.verbose else logging.INFO,
        out_dir / "run.log")

    import dataclasses

    from .config import SimulationConfig, simulation_config_from_dict
    from .dataset import DatasetGenerator

    if sim_overrides:
        sim_overrides.setdefault("use_pml", not args.no_pml)
        cfg = simulation_config_from_dict(sim_overrides)
    else:
        cfg = SimulationConfig(use_pml=not args.no_pml)
    if args.mesh_min_points:
        cfg = dataclasses.replace(cfg, mesh_min_points=args.mesh_min_points,
                                  mesh_target_points=2 * args.mesh_min_points)

    logger.info("=== pl_fem_tpu dataset generation ===")
    logger.info("samples=%d out=%s pml=%s solver=%s", args.n,
                out_dir.absolute(), not args.no_pml,
                "scalar" if args.scalar else "vectorial")

    gen = DatasetGenerator(
        config=cfg,
        use_vectorial=not args.scalar,
        use_cauchy_dispersion=args.cauchy,
        n_taper_slices=args.cmt_slices,
        base_seed=args.seed,
        out_dir=out_dir,
    )
    if args.adaptive_rounds >= 2:
        records = gen.generate_adaptive(
            args.n, n_rounds=args.adaptive_rounds,
            quality_threshold=args.quality_threshold,
            resume=not args.no_resume, engine=args.engine)
    else:
        records = gen.generate(args.n,
                               quality_threshold=args.quality_threshold,
                               resume=not args.no_resume,
                               engine=args.engine)

    n_ok = sum(1 for r in records if r.success)
    logger.info("done: %d/%d successful", n_ok, len(records))
    valid = gen.physical_filter(records)
    logger.info("physical filter: %d records in [0.3, 10] dB IL window",
                len(valid))
    if valid:
        import pandas as pd

        df = pd.DataFrame([r.to_csv_row() for r in valid])
        stats = df[["IL_phys_mux_dB", "MDL_phys_mux_dB",
                    "PDL_mux_dB"]].describe()
        logger.info("dataset statistics:\n%s", stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
