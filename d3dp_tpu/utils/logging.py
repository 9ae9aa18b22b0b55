"""Observability: stdout tee + optional TensorBoard scalars.

Capability parity with the reference (common/logging.py + SummaryWriter usage
in main.py:55-61, :521-527).
"""

import sys


class Logger:
    """Tee stdout to a log file. (reference: common/logging.py:3-13)"""

    def __init__(self, path, stream=None):
        self.terminal = stream or sys.stdout
        self.log = open(path, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()


class TensorBoardWriter:
    """Lazy SummaryWriter wrapper.

    Backends, in order: torch's SummaryWriter, then tensorboardX (the
    torch-free fallback for TPU deployments). When neither imports, the
    writer no-ops — with a visible warning, so a torch-free box doesn't
    silently lose all scalar logging."""

    def __init__(self, logdir, enabled=True):
        self._writer = None
        if not enabled:
            return
        for modname in ("torch.utils.tensorboard", "tensorboardX"):
            try:
                import importlib

                mod = importlib.import_module(modname)
                self._writer = mod.SummaryWriter(logdir)
                return
            except Exception:
                continue
        import warnings

        warnings.warn(
            "TensorBoardWriter: no backend available (tried torch's "
            "SummaryWriter and tensorboardX) — scalar logging is disabled. "
            "Install tensorboardX for torch-free logging, or pass --nolog "
            "to silence this.")

    def add_scalar(self, tag, value, step):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def add_text(self, tag, text):
        if self._writer is not None:
            self._writer.add_text(tag, text)

    def close(self):
        if self._writer is not None:
            self._writer.close()
