"""Executor — the user-extensible stateful operator base class.

Parity target: reference pyquokka/executors/base_executor.py:26-32.
Contract: ``execute(batches, stream_id, executor_id)`` is called with a
list of batches (pandas DataFrames here; Arrow/Polars there) and may
return an output batch; ``done(executor_id)`` flushes terminal state.

Mapping to Spark (SURVEY §2.9): a keyed stateful executor runs under
``groupBy(key).applyInPandas`` — the whole key group arrives as one
batch, so execute-then-done per group reproduces the streaming
accumulate/flush semantics; an unkeyed executor runs per partition
under ``mapInPandas`` (one Quokka channel == one partition).
"""

from __future__ import annotations


class Executor:
    def execute(self, batches, stream_id, executor_id):
        raise NotImplementedError

    def done(self, executor_id):
        raise NotImplementedError
