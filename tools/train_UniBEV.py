#!/usr/bin/env python
"""Train CLI — flag surface mirrors the reference tools/train_UniBEV.py
(/root/reference/tools/train_UniBEV.py:29-99): config, --work-dir,
--resume-from, --no-validate, --seed, --deterministic, --cfg-options,
--autoscale-lr.  Launcher flags are accepted for compatibility; on TPU the
runtime is a single process owning all local devices (multi-host via
``jax.distributed.initialize`` when JAX_COORDINATOR is set).
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# Persistent compilation cache: repeated CLI invocations (and the e2e test
# suite's subprocesses) re-compile identical graphs otherwise — minutes per
# run through the axon tunnel or on the 1-core CPU host.
import jax  # noqa: E402

# Honor JAX_PLATFORMS from the environment via jax.config: the axon
# sitecustomize imports jax and registers the TPU backend before any user
# code runs, so the env var alone cannot select CPU here (same trap
# tests/conftest.py documents) — a subprocess launched with
# JAX_PLATFORMS=cpu would silently fall through to the TPU relay.
_plats = os.environ.get("JAX_PLATFORMS")
if _plats:
    try:
        jax.config.update("jax_platforms", _plats)
    except Exception:
        pass

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("UNIBEV_COMPILE_CACHE",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def parse_args():
    p = argparse.ArgumentParser(description="Train UniBEV (TPU)")
    p.add_argument("config", help="train config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--resume-from", help="checkpoint dir to resume from")
    p.add_argument("--load-from", help="checkpoint to warm start from")
    p.add_argument("--no-validate", action="store_true")
    group_gpus = p.add_mutually_exclusive_group()
    group_gpus.add_argument("--gpus", type=int,
                            help="accepted for reference-CLI parity "
                                 "(train_UniBEV.py:38-47); TPU devices are "
                                 "discovered via jax.devices()")
    group_gpus.add_argument("--gpu-ids", type=int, nargs="+",
                            help="accepted for reference-CLI parity; ignored")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true",
                   help="accepted for parity; seeded jax.random is "
                        "deterministic by construction")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="key=value dotted config overrides")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="scale lr linearly with device count (8-device base)")
    p.add_argument("--launcher", default="none",
                   choices=["none", "pytorch", "slurm", "mpi", "tpu"],
                   help="accepted for config parity; ignored on TPU")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total train steps (smoke tests)")
    p.add_argument("--synthetic-data", action="store_true",
                   help="use the synthetic dataset (no nuScenes on disk)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import numpy as np

    # Multi-host init FIRST (reference init_dist at train_UniBEV.py:157-165):
    # no-ops single-host; on pods/clusters it wires the coordinator so every
    # jax.device_count()/process_index() below sees the full mesh.
    from unibev_tpu.parallel.dist import init_dist
    init_dist()

    from unibev_tpu.config.config import Config, parse_cfg_option_value
    from unibev_tpu.data.nuscenes_dataset import (NuScenesDataset,
                                                  SyntheticNuScenes, collate)
    from unibev_tpu.registry import DETECTORS, build_from_cfg
    from unibev_tpu.runtime.logging_utils import (MetricsLogger, collect_env,
                                                  get_root_logger)
    from unibev_tpu.runtime.train_loop import Runner

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = {}
        for kv in args.cfg_options:
            k, v = kv.split("=", 1)
            opts[k] = parse_cfg_option_value(v)
        cfg.merge_from_dict(opts)

    # work_dir precedence: CLI > cfg > config filename (reference :136-143).
    if args.work_dir:
        work_dir = args.work_dir
    elif cfg.get("work_dir"):
        work_dir = cfg.work_dir
    else:
        work_dir = osp.join("./work_dirs",
                            osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)

    if args.autoscale_lr:
        cfg.optimizer["lr"] = cfg.optimizer["lr"] * jax.device_count() / 8

    timestamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    logger = get_root_logger(osp.join(work_dir, f"{timestamp}.log"),
                             cfg.get("log_level", "INFO"))
    cfg.dump(osp.join(work_dir, osp.basename(args.config)))
    logger.info(f"Environment: {collect_env()}")
    logger.info(f"Config:\n{cfg.pretty_text}")
    logger.info(f"Set random seed to {args.seed}")

    model_cfg = dict(cfg.model)
    model_cfg.setdefault("use_lidar", cfg.input_modality["use_lidar"])
    model_cfg.setdefault("use_camera", cfg.input_modality["use_camera"])
    model = build_from_cfg(model_cfg, DETECTORS)

    from unibev_tpu.registry import DATASETS
    train_cfg_d = dict(cfg.data["train"]) if cfg.get("data") else {}
    if args.synthetic_data or train_cfg_d.get("type") == "SyntheticNuScenes":
        keep = ("length", "num_cams", "img_hw", "max_points", "max_gt", "seed")
        train_ds = SyntheticNuScenes(
            **{k: v for k, v in train_cfg_d.items() if k in keep})
        val_ds = None
    else:
        train_ds = build_from_cfg(train_cfg_d, DATASETS)
        val_ds = None
        if not args.no_validate and cfg.data.get("val"):
            val_ds = build_from_cfg(dict(cfg.data["val"]), DATASETS)

    eval_fn = None
    if val_ds is not None:
        from unibev_tpu.runtime.eval_hook import make_eval_fn
        eval_fn = make_eval_fn(model)
    runner = Runner(model, train_ds, cfg, work_dir, logger,
                    val_dataset=val_ds, eval_fn=eval_fn, seed=args.seed)

    # The loader shards indices per process (parallel.dist.shard_indices),
    # so each host loads only its LOCAL slice of the global batch.
    spg = int(cfg.get("samples_per_gpu", 1))
    B_local = spg * jax.local_device_count()
    workers = int(cfg.get("workers_per_gpu", 2))

    from unibev_tpu.data.loader import DataLoader
    loader = DataLoader(train_ds, batch_size=B_local, shuffle=True,
                        num_workers=workers, seed=args.seed)

    def batch_iter():
        for step, batch in enumerate(loader):
            yield batch
            if args.max_steps and step + 1 >= args.max_steps:
                return

    first = next(iter(batch_iter()))
    first = {k: v for k, v in first.items() if k != "img_metas"}
    state = runner.init_state(first, load_from=args.load_from or cfg.get("load_from"),
                              resume_from=args.resume_from or cfg.get("resume_from"))
    logger.info("train state initialized; starting loop")

    if args.max_steps:
        runner.max_epochs = 1

    state = runner.run(state, batch_iter)
    runner.ckpt.save(int(state.step), jax.device_get(state))
    logger.info("training finished")


if __name__ == "__main__":
    main()
