"""Training logging + NaN-watchdog + rollback checkpointing.

TPU-native re-design of `Experiments/log_debugger.py:13-88` and the legacy
`MFGP_ver2023May/utils/mfgp_log.py:3-45`:

* `LogDebugger(method)` — file (DEBUG) + console (INFO) logging into
  ``log/<METHOD>/train.log`` like the reference (`log_debugger.py:17-31`);
  `record_stage` ingests per-stage loss histories from the train
  functions (the per-step NaN rollback itself lives inside the compiled
  scan, `train/fit.py` — the reference's python-level `get_status` check
  cannot exist inside jit); non-finite tails are logged as errors and the
  last-good params snapshot is persisted to ``rollback_checkpoint.npz``
  (`log_debugger.py:77-83` semantics).
* `MFGPLog` — the colored console wrapper (`mfgp_log.py`).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

import numpy as np


class LogDebugger:
    def __init__(self, method: str, log_dir: str = "log", capture_excepthook: bool = True):
        self.method = method
        self.dir = os.path.join(log_dir, method)
        os.makedirs(self.dir, exist_ok=True)
        self.logger = logging.getLogger(f"fidelityfusion.{method}")
        self.logger.setLevel(logging.DEBUG)
        self.logger.handlers.clear()
        fh = logging.FileHandler(os.path.join(self.dir, "train.log"))
        fh.setLevel(logging.DEBUG)
        ch = logging.StreamHandler()
        ch.setLevel(logging.INFO)
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        fh.setFormatter(fmt)
        ch.setFormatter(fmt)
        self.logger.addHandler(fh)
        self.logger.addHandler(ch)
        self.histories = []
        if capture_excepthook:
            # log uncaught exceptions (`log_debugger.py:33-39`)
            prev_hook = sys.excepthook

            def hook(exc_type, exc, tb):
                self.logger.error("uncaught exception", exc_info=(exc_type, exc, tb))
                prev_hook(exc_type, exc, tb)

            sys.excepthook = hook

    def record_stage(self, stage: int, losses) -> None:
        """Ingest a stage's loss history (possibly (restarts, steps))."""
        arr = np.asarray(losses)
        self.histories.append(arr)
        final = arr.reshape(-1)[-1]
        n_bad = int(np.sum(~np.isfinite(arr)))
        if n_bad:
            self.logger.error(
                "stage %d: %d non-finite losses encountered (rolled back in-scan)",
                stage,
                n_bad,
            )
        self.logger.info("stage %d: final loss %.6f", stage, float(final))
        self.logger.debug("stage %d losses: %s", stage, arr.reshape(-1)[-10:])

    def save_rollback(self, params, path: Optional[str] = None) -> str:
        """Persist a last-good parameter snapshot
        (`log_debugger.py:77-83`)."""
        import jax

        path = path or os.path.join(self.dir, "rollback_checkpoint.npz")
        leaves, treedef = jax.tree_util.tree_flatten(params)
        np.savez(path, *[np.asarray(leaf) for leaf in leaves])
        self.logger.info("rollback checkpoint saved to %s", path)
        return path


class MFGPLog:
    """ANSI-colored static print wrappers (`mfgp_log.py:3-45`)."""

    @staticmethod
    def i(*args):
        print("\033[92m[INFO]\033[0m", *args)

    @staticmethod
    def w(*args):
        print("\033[93m[WARN]\033[0m", *args)

    @staticmethod
    def e(*args):
        print("\033[91m[ERROR]\033[0m", *args)

    @staticmethod
    def d(*args):
        print("[DEBUG]", *args)
