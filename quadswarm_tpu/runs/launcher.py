"""Experiment launcher: run descriptions with parameter grids.

Reference: Sample Factory's launcher (RunDescription/Experiment/ParamGrid
consumed by swarm_rl/runs/**) with `--backend=processes|slurm`.  Same
concepts: a run file exposes RUN_DESCRIPTION; the launcher expands the
parameter grid into experiment commands and executes them sequentially /
in parallel subprocesses, or emits sbatch scripts.

    python -m quadswarm_tpu.runs.launcher --run=quadswarm_tpu.runs.quad_multi_mix_baseline \
        --backend=processes --max_parallel=1
"""
from __future__ import annotations

import argparse
import importlib
import itertools
import os
import shlex
import subprocess
import sys


class ParamGrid:
    def __init__(self, params: list[tuple[str, list]]):
        self.params = params

    def generate_params(self, randomize: bool = False):
        names = [p[0] for p in self.params]
        for combo in itertools.product(*[p[1] for p in self.params]):
            yield dict(zip(names, combo))


class Experiment:
    def __init__(self, name: str, cmd: str, param_generator=None):
        self.name = name
        self.cmd = cmd
        self.params = list(param_generator) if param_generator else [{}]


class RunDescription:
    def __init__(self, run_name: str, experiments: list[Experiment]):
        self.run_name = run_name
        self.experiments = experiments

    def commands(self, train_dir: str):
        for exp in self.experiments:
            for i, params in enumerate(exp.params):
                suffix = "_".join(f"{k.split('_')[-1]}{v}" for k, v in params.items())
                name = f"{exp.name}_{suffix}" if suffix else exp.name
                extra = " ".join(f"--{k}={v}" for k, v in params.items())
                yield name, f"{exp.cmd} {extra} --experiment={name} --train_dir={train_dir}"


SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --output={train_dir}/{name}/slurm.out
#SBATCH --time={timeout}
#SBATCH {gres}
# auto-requeue on timeout (reference: runs/slurm/sbatch_timeout.sh)
timeout {timeout_cmd} {cmd}
if [[ $? -eq 124 ]]; then
  sbatch $0
fi
"""


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True,
                   help="module exposing RUN_DESCRIPTION")
    p.add_argument("--backend", default="processes",
                   choices=["processes", "slurm", "dry"])
    p.add_argument("--train_dir", default="train_dir")
    p.add_argument("--max_parallel", default=1, type=int)
    p.add_argument("--pause_between", default=1, type=float)
    p.add_argument("--slurm_timeout", default="23:59:00")
    p.add_argument("--slurm_gpus_per_job", default=0, type=int)
    args = p.parse_args(argv)

    module = importlib.import_module(args.run)
    rd: RunDescription = module.RUN_DESCRIPTION
    cmds = list(rd.commands(args.train_dir))
    print(f"run {rd.run_name}: {len(cmds)} experiments")

    if args.backend == "dry":
        for name, cmd in cmds:
            print(f"  {name}: {cmd}")
        return 0

    if args.backend == "slurm":
        os.makedirs(args.train_dir, exist_ok=True)
        for name, cmd in cmds:
            os.makedirs(os.path.join(args.train_dir, name), exist_ok=True)
            script = SBATCH_TEMPLATE.format(
                name=name, train_dir=args.train_dir, cmd=cmd,
                timeout=args.slurm_timeout, timeout_cmd="23h",
                gres=f"--gres=gpu:{args.slurm_gpus_per_job}"
                if args.slurm_gpus_per_job else "--ntasks=1")
            path = os.path.join(args.train_dir, f"{name}.sbatch")
            with open(path, "w") as f:
                f.write(script)
            subprocess.run(["sbatch", path], check=False)
        return 0

    # processes backend
    import time
    running: list[tuple[str, subprocess.Popen]] = []
    pending = list(cmds)
    failed = []
    while pending or running:
        while pending and len(running) < args.max_parallel:
            name, cmd = pending.pop(0)
            print(f"launching {name}")
            proc = subprocess.Popen(shlex.split(cmd))
            running.append((name, proc))
            time.sleep(args.pause_between)
        still = []
        for name, proc in running:
            ret = proc.poll()
            if ret is None:
                still.append((name, proc))
            elif ret != 0:
                failed.append(name)
                print(f"FAILED {name} (exit {ret})")
        running = still
        time.sleep(1.0)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
