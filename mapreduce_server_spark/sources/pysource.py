"""Custom data source via the Spark 4 Python DataSource API.

The reference reads records from user-provided input formats; Spark's
modern extension point for "my data lives somewhere Spark has no reader
for" is ``pyspark.sql.datasource`` — schema + partition planning on the
driver, per-partition generators on executors, Arrow-batched back to the
JVM. This module implements a deterministic synthetic-corpus source
(``synthdocs``) exercising the full reader contract:

- ``partitions()`` declares N independent splits → Spark schedules one
  task per split (the parallelism contract — a source without it reads
  on a single task);
- ``read(partition)`` yields rows for one split only, derived purely
  from (doc_id, literal seeds) via md5 — NO RNG, so any split is
  reproducible on retry/speculation, the same property every operator
  here relies on for the exact-hash gate;
- pushdown note: this simple source declares none, so Catalyst applies
  filters after the scan; a production source would implement the
  filter-pushdown hooks the parquet reader gets for free.

The same source also implements the STREAMING contract
(``SimpleDataSourceStreamReader``): offsets are plain dicts checkpointed
by the engine, each micro-batch emits the id range [start, end) at
``rowsPerBatch``, and because rows derive purely from ids, replaying a
batch after failure reproduces identical rows — exactly-once via
deterministic replay, the property Kafka-offset sources provide and every
custom source must.

The WRITE path (``jsonlcommit`` source) demonstrates the two-phase
commit contract every distributed writer needs: each task writes its
partition to a UNIQUE temp file and returns a commit message; only the
driver-side ``commit()`` publishes the batch by renaming temp files into
place (``abort()`` removes them) — so a failed/speculated task can never
leave a partial file visible, the same staging discipline the parquet
committer applies at 100 TB.

Registered per-session with ``spark.dataSource.register(SynthDocs)`` /
``register(JsonlCommit)``; used by tests/test_pysource.py."""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()
_LANGS = ("en", "de", "fr", "ja")
_TOKENS_PER_DOC = 12


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of the parts (md5 prefix — stable across
    processes, unlike Python's salted builtin hash)."""
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def doc_row(doc_id: int) -> tuple[int, str, str]:
    """The synthetic document for one id — pure function, shared by the
    source and by tests asserting reproducibility."""
    words = [
        _WORDS[_h("w", doc_id, i) % len(_WORDS)] for i in range(_TOKENS_PER_DOC)
    ]
    return doc_id, " ".join(words), _LANGS[_h("l", doc_id) % len(_LANGS)]


@dataclass
class _Split(InputPartition):
    start: int
    end: int


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = -(-self.rows // self.parts)  # ceil
        return [
            _Split(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Split):
        for doc_id in range(partition.start, partition.end):
            yield doc_row(doc_id)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offset = {"id": next_unread}; each batch emits
    up to rowsPerBatch ids until maxRows, then goes idle (empty batches).
    read() returns (rows, next_offset); readBetweenOffsets() replays a
    committed range deterministically for recovery."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def read(self, start: dict):
        lo = start["id"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        rows = [doc_row(i) for i in range(lo, hi)]
        return rows, {"id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [doc_row(i) for i in range(start["id"], end["id"])]


class SynthDocs(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


@dataclass
class _FileCommit(WriterCommitMessage):
    temp_path: str
    final_path: str
    n_rows: int


class JsonlCommitWriter(DataSourceWriter):
    """Per-task: stream rows to a unique `.tmp-<uuid>` file; the rename
    to the final name happens ONLY in driver commit()."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        token = uuid.uuid4().hex
        tmp = os.path.join(self.path, f".tmp-{token}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(tmp, os.path.join(self.path, f"part-{token}.jsonl"), n)

    def commit(self, messages):
        for m in messages:
            os.rename(m.temp_path, m.final_path)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlCommit(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlcommit"

    def schema(self) -> str:  # required override; unused for write-only
        return "doc_id bigint, text string, lang string"

    def writer(self, schema, overwrite: bool) -> JsonlCommitWriter:
        return JsonlCommitWriter(self.options)
