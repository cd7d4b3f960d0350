"""Stateful property test for the snapshot-log commit protocol
(engine/snapshots.py): under any interleaving of normal commits,
orphan manifests (a writer that died between publish and pointer
advance), torn legacy manifests, stale LATEST pointers, and orphan
GC, the log must agree with a trivial in-memory model — committed
buckets are exactly the model's, the parent chain is linear and
complete, and GC never removes a referenced data directory.

Runs the SAME machine against both AtomicStore implementations
(PosixStore, the tmp+os.link default; MemoryStore, the conditional-PUT
twin) — the protocol's guarantees are a property of the interface, not
of POSIX semantics, which is what lets the log survive an object-store
deployment.

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

from pdf_parser_spark.engine.snapshots import (
    MemoryStore,
    PosixStore,
    SnapshotLog,
)


class SnapshotLogMachine(RuleBasedStateMachine):
    def make_store(self, log_dir):
        raise NotImplementedError

    def inject_manifest(self, version: int, data: bytes) -> None:
        """Simulate a foreign writer's published (or legacy torn)
        manifest bytes, bypassing commit()."""
        raise NotImplementedError

    @initialize()
    def setup(self):
        self.root = tempfile.mkdtemp(prefix="snaplog_prop_")
        log_dir = os.path.join(self.root, "_snapshots")
        self.store = self.make_store(log_dir)
        self.log = SnapshotLog(self.root, store=self.store)
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
        """A concurrent writer published the next manifest but died
        before advancing LATEST: the next commit must adopt it."""
        v = (self.log.latest_version() or 0) + 1 if self.model else 0
        if self.store.read(f"v{v}.json") is not None:
            return
        b = self.next_bucket
        self.next_bucket += 1
        data = self._mkdata(f"bucket={b}")
        self.inject_manifest(
            v,
            json.dumps(
                {
                    "version": v,
                    "parent": v - 1 if v else None,
                    "bucket": b,
                    "paths": [data],
                    "metrics": {"n_docs": 1},
                    "ts": 0.0,
                    "n_buckets": 1024,
                    "stats": None,
                }
            ).encode(),
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
        """Torn manifest bytes in the next slot (debris of a PRE-link-
        protocol writer killed mid-json.dump — the current publish is
        all-or-nothing and can't produce this); the next commit must
        reclaim the slot."""
        v = (self.log.latest_version() + 1) if self.model else 0
        if self.store.read(f"v{v}.json") is not None:
            return
        self.inject_manifest(v, b'{"version": ')
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
    def stale_pointer_advance(self):
        """A loser that raced at an OLD version advances the pointer
        late: LATEST must never move backwards (monotonic CAS-up)."""
        latest = self.log.latest_version()
        if latest is None or latest == 0:
            return
        self.store.advance_pointer("LATEST", 0)
        assert self.log.latest_version() == latest

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


class PosixMachine(SnapshotLogMachine):
    def make_store(self, log_dir):
        return PosixStore(log_dir)

    def inject_manifest(self, version, data):
        # a foreign/legacy writer's bytes land as a plain file
        with open(os.path.join(self.log.log_dir, f"v{version}.json"), "wb") as f:
            f.write(data)


class MemoryMachine(SnapshotLogMachine):
    def make_store(self, log_dir):
        return MemoryStore()

    def inject_manifest(self, version, data):
        self.store._objects[f"v{version}.json"] = data


_SETTINGS = settings(max_examples=40, stateful_step_count=30, deadline=None)

TestSnapshotLogProtocolPosix = PosixMachine.TestCase
TestSnapshotLogProtocolPosix.settings = _SETTINGS

TestSnapshotLogProtocolMemory = MemoryMachine.TestCase
TestSnapshotLogProtocolMemory.settings = _SETTINGS
