"""Cluster submission: build sbatch scripts from job commands with env
exports, account cycling, and dry-run/local modes (capability match for
contrastyou/submitter2.py:22-238 ``SlurmSubmitter``). For TPU fleets the same
interface emits plain shell scripts runnable under any scheduler."""
from __future__ import annotations

import itertools
import os
import subprocess
import tempfile
import typing as t


def grid_search(**param_lists: t.Sequence) -> t.Iterator[dict]:
    """Cartesian product over named value lists (ref: script/utils.py:17)."""
    keys = list(param_lists)
    for values in itertools.product(*(param_lists[k] for k in keys)):
        yield dict(zip(keys, values))


class SlurmSubmitter:
    def __init__(self, *, work_dir: str = ".", stop_on_error: bool = True,
                 on_local: bool = False, dry_run: bool = False,
                 account_list: t.Sequence[str] = (), time: int = 4,
                 mem: int = 16, cpus: int = 6, gres: str | None = None):
        self._work_dir = str(work_dir)
        self._stop_on_error = stop_on_error
        self._on_local = on_local
        self._dry_run = dry_run
        self._accounts = itertools.cycle(account_list) if account_list else None
        self._sbatch_params = {"time": f"0-{time:02d}:00", "mem": f"{mem}000M",
                               "cpus-per-task": str(cpus)}
        if gres:
            self._sbatch_params["gres"] = gres
        self._env_exports: list[str] = []
        self.submitted: list[str] = []

    def configure_environment(self, commands: t.Sequence[str]) -> None:
        self._env_exports = list(commands)

    def configure_sbatch(self, **kwargs) -> None:
        self._sbatch_params.update({k.replace("_", "-"): str(v)
                                    for k, v in kwargs.items()})

    def _script(self, job: str) -> str:
        lines = ["#!/bin/bash"]
        for key, value in self._sbatch_params.items():
            lines.append(f"#SBATCH --{key}={value}")
        if self._accounts is not None:
            lines.append(f"#SBATCH --account={next(self._accounts)}")
        if self._stop_on_error:
            lines.append("set -e")
        lines += self._env_exports
        lines.append(f"cd {self._work_dir}")
        lines.append(job)
        return "\n".join(lines) + "\n"

    def submit(self, job: str, *, on_local: bool | None = None) -> str:
        script = self._script(job)
        self.submitted.append(script)
        if self._dry_run:
            print(script)
            return script
        local = self._on_local if on_local is None else on_local
        fd, path = tempfile.mkstemp(suffix=".sh")
        with os.fdopen(fd, "w") as f:
            f.write(script)
        cmd = ["bash", path] if local else ["sbatch", path]
        code = subprocess.call(cmd)
        if code != 0 and self._stop_on_error:
            raise RuntimeError(f"job failed with code {code}:\n{script}")
        return script
