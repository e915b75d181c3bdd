"""Evaluation CLI.

Re-design of the reference's ``evaluation/{synburst,burstsr}/*.py`` script
trio as one entry point:

    python run_evaluation.py synburst compute_score <experiment> [opts]
    python run_evaluation.py synburst save_results <experiment> [opts]
    python run_evaluation.py synburst visualize <experiment> [opts]
    python run_evaluation.py burstsr  compute_score <experiment> [opts]
    python run_evaluation.py burstsr  save_results <experiment> [opts]

``<experiment>`` names a module in ``dbsr_tpu/evaluation/experiments``
whose ``main()`` returns the ``NetworkParam`` list (config-as-code, same
contract as the reference).
"""

import argparse
import importlib
import os
import time

_T0 = time.perf_counter()


def _load_experiment(name):
    mod = importlib.import_module(f"dbsr_tpu.evaluation.experiments.{name}")
    return mod.main()


def main():
    p = argparse.ArgumentParser(description="Evaluate DBSR networks.")
    p.add_argument("benchmark", choices=["synburst", "burstsr"])
    p.add_argument("action",
                   choices=["compute_score", "save_results", "visualize"])
    p.add_argument("experiment", help="experiment module name, "
                                      "e.g. dbsr_default")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--load_saved", action="store_true",
                   help="score saved predictions instead of running nets")
    p.add_argument("--max_bursts", type=int, default=None)
    p.add_argument("--no_lpips", action="store_true")
    p.add_argument("--lpips_weights", default=None,
                   help="path to converted lpips_alex.npz (overrides "
                        "DBSR_TPU_LPIPS_WEIGHTS / pretrained-nets dir)")
    p.add_argument("--json", default=None, metavar="PATH",
                   help="also write compute_score results as JSON")
    p.add_argument("--all_epochs", action="store_true",
                   help="score EVERY checkpoint epoch of the experiment's "
                        "first network in one process (val set staged on "
                        "device once, one compiled graph; no LPIPS)")
    p.add_argument("--epochs", default=None, metavar="E1,E2,...",
                   help="with --all_epochs: score only these checkpoint "
                        "epochs (comma-separated). Campaign drivers use "
                        "this to score checkpoint batches incrementally "
                        "while paying the val-set staging once per batch")
    args = p.parse_args()

    if args.load_saved and not args.out_dir:
        p.error("--load_saved requires --out_dir (the directory the "
                "predictions were saved to with save_results)")
    if args.load_saved and args.action != "compute_score":
        p.error("--load_saved only applies to compute_score")
    if args.load_saved and args.benchmark != "synburst":
        p.error("--load_saved is only supported for the synburst benchmark "
                "(burstsr scoring needs the burst inputs for spatial-color "
                "alignment, so it always runs the networks)")
    if args.all_epochs and (args.benchmark != "synburst"
                            or args.action != "compute_score"
                            or args.load_saved):
        p.error("--all_epochs only applies to synburst compute_score on "
                "live networks")
    epochs = None
    if args.epochs is not None:
        if not args.all_epochs:
            p.error("--epochs requires --all_epochs")
        try:
            epochs = sorted({int(e) for e in args.epochs.split(",") if e})
        except ValueError:
            p.error(f"--epochs must be comma-separated integers, "
                    f"got {args.epochs!r}")
        if not epochs:
            p.error("--epochs must name at least one epoch")

    from dbsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from dbsr_tpu.environment import env_settings
    env = env_settings()
    network_params = _load_experiment(args.experiment)
    workspace = env.workspace_dir
    print(f"[timing] process init (imports + env) {time.perf_counter() - _T0:.1f}s",
          flush=True)

    scores = None
    if args.benchmark == "synburst":
        root = args.dataset_root or env.synburstval_dir
        from dbsr_tpu.evaluation import synburst as ev
        if args.action == "compute_score" and args.all_epochs:
            n0 = network_params[0]
            scores = ev.compute_score_trajectory(
                n0.module, n0.parameter, root, workspace_dir=workspace,
                net_name=n0.net_name, burst_sz=n0.burst_sz,
                epochs=epochs, max_bursts=args.max_bursts)
        elif args.action == "compute_score":
            scores = ev.compute_score(
                network_params, root, workspace_dir=workspace,
                saved_results_root=(args.out_dir if args.load_saved else None),
                with_lpips=not args.no_lpips,
                lpips_weights=args.lpips_weights,
                max_bursts=args.max_bursts)
        elif args.action == "save_results":
            out = args.out_dir or os.path.join(workspace, "synburst_results")
            ev.save_results(network_params, root, out,
                            workspace_dir=workspace)
        else:
            from dbsr_tpu.evaluation.visualize import visualize_synburst
            out = args.out_dir or os.path.join(workspace, "synburst_vis")
            visualize_synburst(network_params, root, out,
                               workspace_dir=workspace,
                               max_bursts=args.max_bursts or 10)
    else:
        root = args.dataset_root or env.burstsr_dir
        from dbsr_tpu.evaluation import burstsr as ev
        if args.action == "compute_score":
            scores = ev.compute_score(network_params, root,
                                      workspace_dir=workspace,
                                      with_lpips=not args.no_lpips,
                                      lpips_weights=args.lpips_weights,
                                      max_bursts=args.max_bursts)
        elif args.action == "save_results":
            out = args.out_dir or os.path.join(workspace, "burstsr_results")
            ev.save_results(network_params, root, out,
                            workspace_dir=workspace)
        else:
            from dbsr_tpu.evaluation.visualize import visualize_burstsr
            out = args.out_dir or os.path.join(workspace, "burstsr_vis")
            visualize_burstsr(network_params, root, out,
                              workspace_dir=workspace,
                              max_bursts=args.max_bursts or 5)

    if args.json and scores is not None:
        import json
        with open(args.json, "w") as f:
            json.dump(scores, f, indent=2)


if __name__ == "__main__":
    main()
