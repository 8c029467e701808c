"""Dataset base class (parity: ``python/dgl/data/dgl_dataset.py``)."""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

from dgl1_tpu.data.serialize import load_graphs, save_graphs

__all__ = ["GraphDataset", "data_dir"]


def data_dir() -> Path:
    return Path(os.environ.get("DGL1_TPU_DATA_DIR",
                               os.path.expanduser("~/.dgl1_tpu")))


class GraphDataset:
    """Load-or-generate dataset base.

    Subclasses implement ``_generate() -> (graphs, labels_dict)`` (the
    synthetic fallback) and may implement ``_load_raw()`` to parse real raw
    files when present. Processed graphs are cached as npz containers.
    """

    name: str = "dataset"

    def __init__(self, raw_dir: Optional[str] = None, force_reload: bool = False,
                 verbose: bool = False):
        self.raw_dir = Path(raw_dir) if raw_dir else data_dir() / self.name
        self.verbose = verbose
        self.is_synthetic = False
        cache = self.raw_dir / f"{self.name}_processed.npz"
        if cache.exists() and not force_reload:
            self.graphs, self.labels = load_graphs(str(cache))
            self.is_synthetic = bool(
                self.labels.get("__synthetic__", [0])[0]
            ) if "__synthetic__" in self.labels else False
            return
        if self._has_raw():
            self.graphs, self.labels = self._load_raw()
        else:
            self.graphs, self.labels = self._generate()
            self.is_synthetic = True
        try:
            self.raw_dir.mkdir(parents=True, exist_ok=True)
            import numpy as np

            labels = dict(self.labels)
            labels["__synthetic__"] = np.asarray([int(self.is_synthetic)])
            save_graphs(str(cache), self.graphs, labels)
        except OSError:
            pass  # cache is best-effort

    # Overridables ------------------------------------------------------
    def _has_raw(self) -> bool:
        return False

    def _load_raw(self):
        raise NotImplementedError

    def _generate(self):
        raise NotImplementedError

    # Container protocol ------------------------------------------------
    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i):
        return self.graphs[i]
