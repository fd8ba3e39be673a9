"""TensorBoard scalar logging.

Keeps the reference's TB contract (``dassl/engine/trainer.py:240-255``:
per-iteration train scalars under ``{OUTPUT_DIR}/tensorboard``), backed by
``tf.summary`` since tensorflow ships in this environment. When tensorflow
is missing or broken the writer degrades to a no-op but says so ONCE on
stderr (a silent no-op would erase the reference's TB contract without a
word). The tensorflow import itself is wrapped in an fd-level stderr
silence + ``TF_CPP_MIN_LOG_LEVEL=3`` because TF's C++ init probes CUDA on
import and spams ``failed call to cuInit`` / oneDNN banners on CPU-only
hosts — noise that otherwise lands first in correctness artifacts (the
round-4 MULTICHIP tail led with it).
"""

from __future__ import annotations

import contextlib
import os
import sys

_WARNED_DISABLED = False


@contextlib.contextmanager
def _quiet_fd_stderr():
    """Silence fd 2 (C++-level stderr) for the duration of the block.

    TF's import-time absl/C++ log lines bypass sys.stderr; only an fd dup
    catches them. Best-effort: if fd juggling fails, run unsilenced.
    """
    try:
        saved = os.dup(2)
        devnull = os.open(os.devnull, os.O_WRONLY)
    except OSError:
        yield
        return
    try:
        sys.stderr.flush()
        os.dup2(devnull, 2)
        yield
    finally:
        os.dup2(saved, 2)
        os.close(saved)
        os.close(devnull)


class SummaryWriter:
    def __init__(self, log_dir: str):
        self._writer = None
        self._tf = None
        try:
            os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
            with _quiet_fd_stderr():
                import tensorflow as tf

                self._tf = tf
                self._writer = tf.summary.create_file_writer(log_dir)
        except Exception as exc:  # pragma: no cover - tf missing or broken
            self._tf = None
            self._writer = None
            global _WARNED_DISABLED
            if not _WARNED_DISABLED:
                _WARNED_DISABLED = True
                print(
                    "[ovmr_tpu] tensorboard logging DISABLED: tensorflow "
                    f"unavailable ({type(exc).__name__}: {exc}); train "
                    "scalars will not be written under "
                    f"{log_dir!r}",
                    file=sys.stderr,
                )

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, value, step=global_step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
