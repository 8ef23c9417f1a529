"""Experiment checkpoint store (C18).

JSON list of {"config", "metrics", "best_model_filename"} entries with the
same schema as the reference's sweep records (``loader_data.py:526-538``
load/save_checkpoint; data shape per ``dumps/*.json``), used both to record
bests and to skip already-completed configs on resume
(``hyperparam.py:32-38``)."""

from __future__ import annotations

import json
import os
from typing import List, Optional

__all__ = ["SweepStore", "is_config_duplicate"]


def is_config_duplicate(completed_configs: List[dict], config: dict) -> bool:
    """hyperparam.py:14-29: exact key/value match against completed configs."""
    for done in completed_configs:
        if all(done.get(k) == v for k, v in config.items()) and len(done) == len(config):
            return True
    return False


class SweepStore:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> List[dict]:
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    return json.load(f)
            except json.JSONDecodeError:
                print("Error loading checkpoint. Invalid JSON format.")
                return []
        return []

    def save(self, results: List[dict]) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(results, f, indent=4)

    def append(self, entry: dict) -> List[dict]:
        results = self.load()
        results.append(entry)
        self.save(results)
        return results

    def completed_configs(self) -> List[dict]:
        return [r["config"] for r in self.load() if "config" in r]

    def best(self, key: str = "f1_score") -> Optional[dict]:
        results = [r for r in self.load() if r.get("metrics", {}).get(key) is not None]
        return max(results, key=lambda r: r["metrics"][key]) if results else None
