"""TensorBoard scalar logging.

Keeps the reference's TB contract (``dassl/engine/trainer.py:240-255``:
per-iteration train scalars under ``{OUTPUT_DIR}/tensorboard``), backed by
``tf.summary`` since tensorflow ships in this environment; silently no-ops
when unavailable.
"""

from __future__ import annotations


class SummaryWriter:
    def __init__(self, log_dir: str):
        self._writer = None
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:  # pragma: no cover - tf missing or broken
            self._tf = None

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
