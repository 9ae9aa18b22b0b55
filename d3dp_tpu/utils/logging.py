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
    """Lazy SummaryWriter wrapper; no-op when tensorboard is unavailable."""

    def __init__(self, logdir, enabled=True):
        self._writer = None
        if enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(logdir)
            except Exception:
                self._writer = None

    def add_scalar(self, tag, value, step):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def add_text(self, tag, text):
        if self._writer is not None:
            self._writer.add_text(tag, text)

    def close(self):
        if self._writer is not None:
            self._writer.close()
