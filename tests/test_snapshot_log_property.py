"""Stateful property test for the snapshot-log commit protocol
(engine/snapshots.py): under any interleaving of normal commits,
orphan manifests (a writer that died before its pointer flip), torn
manifests (killed mid-json write), stale LATEST pointers, and orphan
GC, the log must agree with a trivial in-memory model — committed
buckets are exactly the model's, the parent chain is linear and
complete, and GC never removes a referenced data directory.

Pure metadata (no Spark): runs in milliseconds per example.
"""

import json
import os
import shutil
import tempfile

from hypothesis import settings
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    rule,
)
from hypothesis import strategies as st

from pdf_parser_spark.engine.snapshots import SnapshotLog


class SnapshotLogMachine(RuleBasedStateMachine):
    @initialize()
    def setup(self):
        self.root = tempfile.mkdtemp(prefix="snaplog_prop_")
        self.log = SnapshotLog(self.root)
        self.model = []  # list of (bucket, paths) in commit order
        self.next_bucket = 0
        self.debris = set()
        self.replaced = {}  # bucket -> its current (post-replace) paths

    def teardown(self):
        shutil.rmtree(self.root, ignore_errors=True)

    def _mkdata(self, name: str) -> str:
        p = os.path.join(self.root, "data", name)
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "part-0.parquet"), "w") as f:
            f.write("x")
        return p

    @rule(n_docs=st.integers(0, 50))
    def commit(self, n_docs):
        b = self.next_bucket
        self.next_bucket += 1
        path = self._mkdata(f"bucket={b}")
        self.log.commit(b, [path], {"n_docs": n_docs}, n_buckets=1024)
        self.model.append((b, [path]))

    @rule()
    def orphan_manifest(self):
        """A concurrent writer created the next manifest but died
        before flipping LATEST: the next commit must adopt it."""
        v = (self.log.latest_version() or 0) + 1 if self.model else 0
        path = os.path.join(self.log.log_dir, f"v{v}.json")
        if os.path.exists(path):
            return
        b = self.next_bucket
        self.next_bucket += 1
        data = self._mkdata(f"bucket={b}")
        with open(path, "w") as f:
            json.dump(
                {
                    "version": v,
                    "parent": v - 1 if v else None,
                    "bucket": b,
                    "paths": [data],
                    "metrics": {"n_docs": 1},
                    "ts": 0.0,
                    "n_buckets": 1024,
                    "stats": None,
                },
                f,
            )
        # visible to readers only after adoption (the model adds it
        # now because chain() follows parents from LATEST, which still
        # lags — adoption happens inside the next commit())
        self.model.append((b, [data]))
        # force adoption immediately so reader-visible state is defined
        nb = self.next_bucket
        self.next_bucket += 1
        d2 = self._mkdata(f"bucket={nb}")
        self.log.commit(nb, [d2], {"n_docs": 2}, n_buckets=1024)
        self.model.append((nb, [d2]))

    @rule()
    def torn_manifest_then_commit(self):
        """A writer killed mid-json.dump leaves a torn next manifest;
        the next commit must drop it and take the slot."""
        v = (self.log.latest_version() + 1) if self.model else 0
        path = os.path.join(self.log.log_dir, f"v{v}.json")
        if os.path.exists(path):
            return
        with open(path, "w") as f:
            f.write('{"version": ')
        b = self.next_bucket
        self.next_bucket += 1
        data = self._mkdata(f"bucket={b}")
        self.log.commit(b, [data], {"n_docs": 3}, n_buckets=1024)
        self.model.append((b, [data]))

    @rule(n_docs=st.integers(0, 50))
    def replace_commit(self, n_docs):
        """Compaction-style rewrite of a random committed bucket: its
        earlier paths are superseded for readers but stay on disk until
        vacuum."""
        if not self.model:
            return
        b = self.model[len(self.model) // 2][0]
        path = self._mkdata(f"bucket={b}-compact-v{len(self.model)}")
        self.log.commit(b, [path], {"n_docs": n_docs}, op="replace")
        self.model.append((b, [path]))
        self.replaced[b] = [path]

    @rule()
    def vacuum(self):
        """vacuum(retain_last=1) may remove superseded and debris dirs
        but NEVER a path visible at the latest version."""
        visible_before = {
            os.path.normpath(p) for s in self.log.visible() for p in s.paths
        }
        removed = set(self.log.vacuum(retain_last=1))
        assert not (removed & visible_before)
        self.debris -= removed

    @rule()
    def crash_debris(self):
        """A bucket directory written but never committed."""
        name = f"bucket=debris{len(self.debris)}"
        self.debris.add(self._mkdata(name))

    @rule()
    def gc(self):
        removed = set(self.log.remove_orphans())
        assert removed == {os.path.normpath(p) for p in self.debris}
        self.debris.clear()

    @invariant()
    def chain_matches_model(self):
        if not hasattr(self, "log"):
            return
        chain = self.log.chain()
        assert [s.bucket for s in chain] == [b for b, _ in self.model]
        assert [s.version for s in chain] == list(range(len(self.model)))
        parents = [s.parent for s in chain]
        want = [None] + list(range(len(self.model) - 1)) if self.model else []
        assert parents == want
        assert self.log.committed_buckets() == {b for b, _ in self.model}

    @invariant()
    def replace_supersedes(self):
        if not hasattr(self, "log") or not self.replaced:
            return
        vis: dict[int, list[str]] = {}
        for s in self.log.visible():
            vis.setdefault(s.bucket, []).extend(s.paths)
        for b, paths in self.replaced.items():
            assert vis[b] == paths, f"bucket {b} not superseded cleanly"

    @invariant()
    def visible_data_is_on_disk(self):
        # superseded (replaced) paths may be vacuumed; paths VISIBLE at
        # the latest version must always exist
        if not hasattr(self, "log"):
            return
        for s in self.log.visible():
            for p in s.paths:
                assert os.path.isdir(p), f"visible data removed: {p}"


TestSnapshotLogProtocol = SnapshotLogMachine.TestCase
TestSnapshotLogProtocol.settings = settings(
    max_examples=40, stateful_step_count=30, deadline=None
)
