"""Training CLI: ``python run_training.py <module> <config>``.

Re-design of reference ``run_training.py:16-55`` without the
multiprocessing setup (no worker processes exist — synthesis is on-device):
builds a ``Settings`` object and invokes
``dbsr_tpu.configs.<module>.<config>.run(settings)``.
"""

import argparse
import importlib


def run_training(module: str, config: str, **overrides):
    # Persistent compile cache: chunked campaigns pay the train-step
    # compile once, not once per 5-epoch training process
    from dbsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    # Multi-host: env-gated jax.distributed.initialize before any device
    # use (no-op unless DBSR_TPU_DIST=1; see dbsr_tpu/parallel/multihost.py)
    from dbsr_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    from dbsr_tpu.environment import Settings

    settings = Settings()
    settings.module = module
    settings.script_name = config
    settings.project_path = f"{module}/{config}"
    for k, v in overrides.items():
        if v is not None:
            setattr(settings, k, v)

    expr = importlib.import_module(f"dbsr_tpu.configs.{module}.{config}")
    expr.run(settings)


def main():
    p = argparse.ArgumentParser(description="Train a network (TPU-native).")
    p.add_argument("module", help="config namespace, e.g. dbsr")
    p.add_argument("config", help="config name, e.g. default_synthetic")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--single_device", action="store_true",
                   help="disable the device mesh (debugging)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides",
                   help="settings override, e.g. --set epochs=10 "
                        "--set fused_resample=False (values are parsed as "
                        "Python literals when possible)")
    args = p.parse_args()

    import ast
    extra = {}
    for item in args.overrides:
        k, _, v = item.partition("=")
        if not _:
            p.error(f"--set expects K=V, got {item!r}")
        try:
            extra[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            extra[k] = v
    # --set may name batch_size/multi_device too; explicit flags win,
    # but don't crash on the duplicate keyword.
    if args.batch_size is not None:
        extra["batch_size"] = args.batch_size
    extra.setdefault("batch_size", None)
    if args.single_device:
        extra["multi_device"] = False
    extra.setdefault("multi_device", True)
    run_training(args.module, args.config, **extra)


if __name__ == "__main__":
    main()
