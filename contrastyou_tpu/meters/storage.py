"""Epoch-indexed history of meter results -> pandas -> storage.csv.

Capability match for contrastyou/meters/{storage_interface.py:19-88, utils.py}:
``with storage:`` flushes csv on exit every epoch; ``add_from_meter_interface``
ingests the nested {stage: {group: {meter: value}}} statistics; state_dict
round-trips so resume restores the metric history.
"""
from __future__ import annotations

from collections import OrderedDict, defaultdict
from pathlib import Path
from typing import Dict

import pandas as pd


class HistoricalContainer:
    """{epoch: result-dict} with convenience summary()."""

    def __init__(self):
        self._record: "OrderedDict[int, dict]" = OrderedDict()

    def add(self, value: dict, epoch: int | None = None) -> None:
        if epoch is None:
            epoch = max(self._record.keys(), default=-1) + 1
        self._record[epoch] = dict(value)

    def __getitem__(self, epoch: int) -> dict:
        return self._record[epoch]

    def __len__(self):
        return len(self._record)

    @property
    def record(self):
        return self._record

    def summary(self) -> pd.DataFrame:
        return pd.DataFrame(self._record).T

    def state_dict(self) -> dict:
        return {"record": dict(self._record)}

    def load_state_dict(self, state: dict) -> None:
        self._record = OrderedDict(sorted(state["record"].items()))


class Storage:
    def __init__(self, save_dir: str | Path, csv_name: str = "storage.csv"):
        self._storage: Dict[str, HistoricalContainer] = defaultdict(HistoricalContainer)
        self._save_dir = str(save_dir)
        self._csv_name = csv_name

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.to_csv()

    def put(self, name: str, value: dict | float, epoch: int | None = None) -> None:
        if not isinstance(value, dict):
            value = {"value": value}
        self._storage[name].add(value, epoch)

    def put_group(self, group_name: str, epoch_result: dict | None,
                  epoch: int | None = None, sep: str = "/") -> None:
        if not epoch_result:
            return
        for k, v in epoch_result.items():
            self.put(group_name + sep + k, v, epoch)

    def add_from_meter_interface(self, *, epoch: int, **stages) -> None:
        """stages: e.g. tra={group: {meter: result}}, val={...} — one call per epoch."""
        for stage_name, groups in stages.items():
            for group_name, group_result in dict(groups).items():
                self.put_group(f"{stage_name}/{group_name}", group_result, epoch)

    def get(self, name: str, epoch: int | None = None):
        container = self._storage[name]
        return container if epoch is None else container[epoch]

    @property
    def meter_names(self) -> list[str]:
        return list(self._storage.keys())

    def summary(self) -> pd.DataFrame:
        frames = []
        for name, container in self._storage.items():
            df = container.summary()
            df.columns = [f"{name}/{c}" for c in df.columns]
            frames.append(df)
        if not frames:
            return pd.DataFrame()
        out = frames[0]
        for df in frames[1:]:
            out = out.merge(df, left_index=True, right_index=True, how="outer")
        return out

    def to_csv(self) -> None:
        path = Path(self._save_dir)
        path.mkdir(parents=True, exist_ok=True)
        self.summary().to_csv(str(path / self._csv_name))

    def state_dict(self) -> dict:
        return {name: c.state_dict() for name, c in self._storage.items()}

    def load_state_dict(self, state: dict) -> None:
        self._storage.clear()
        for name, sub in state.items():
            container = HistoricalContainer()
            container.load_state_dict(sub)
            self._storage[name] = container
