"""Checkpointing: params + optimizer state as an npz container.

Parity: the reference delegates model checkpointing to torch.save in
examples; here a flat npz of the jax pytree (restartable training —
SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, tree: Any, step: int = 0) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef), "step": step,
                    "num_leaves": len(leaves)}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, int]:
    """Restore into the structure of ``like`` (a template pytree)."""
    with np.load(path if str(path).endswith(".npz") else path + ".npz") as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(treedef, leaves), meta["step"]
