"""Multi-tenant index registry — tenant → (index_dir, config) catalog
with per-tenant Searcher routing.

The reference is tenant-scoped end to end: every activity carries a
tenantId (``miru-api/.../activity/MiruActivity.java:34-60``) and the
cluster registry elects replica sets per (tenant, partition)
(``miru-cluster/.../amza/AmzaClusterRegistry.java``).  The Ray-native
analogue keeps the catalog as a ``tenants.json`` file at a registry root
(one JSON object: tenantId → {index_dir, config, n_docs}); a query for a
tenant routes to that tenant's own :class:`~miru_ray.query.engine.Searcher`
(its own reader actor pool over its own index directory), so tenants
share NOTHING but the catalog file — per-tenant config, independent
rebuild/compaction, and at cluster scale independent placement.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from ..config import IndexConfig
from ..query.engine import Searcher
from ..util import atomic_write_json, read_json


class TenantRegistry:
    """Catalog + router.  The catalog write is atomic (tmp+rename) so a
    crashed registration never leaves a torn catalog; registrations are
    last-writer-wins per tenant (re-pointing a tenant at a rebuilt index
    is the normal upgrade flow)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "tenants.json")
        self._catalog: dict[str, dict] = (
            read_json(self.path) if os.path.exists(self.path) else {})
        self._searchers: dict[tuple[str, int], Searcher] = {}
        #: index_dir each cached Searcher was OPENED on — a cross-process
        #: re-point must not keep serving from the old directory
        self._opened_dirs: dict[tuple[str, int], str] = {}

    @contextmanager
    def _locked(self):
        """Advisory file lock serializing catalog read-modify-writes
        across PROCESSES sharing this registry root (the reference's
        registry is a coordinated Amza table; a shared filesystem catalog
        needs the same mutual exclusion or two registrars clobber each
        other).  Single-host scope — a multi-node deployment puts the
        catalog in a real coordination service."""
        import fcntl
        fd = os.open(os.path.join(self.root, "tenants.lock"),
                     os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    # ---------------- catalog ----------------

    def refresh(self) -> None:
        """Re-read the catalog from disk — another PROCESS may have
        registered, re-pointed or removed tenants since this instance
        loaded (the reference's registry is a shared Amza table; ours is
        the shared file).  Cached searchers for VANISHED tenants close
        here; re-pointed tenants close lazily in :meth:`searcher`."""
        self._catalog = (read_json(self.path)
                         if os.path.exists(self.path) else {})
        for key in [k for k in self._searchers if k[0] not in self._catalog]:
            self._searchers.pop(key).close()
            self._opened_dirs.pop(key, None)

    def register(self, tenant: str, index_dir: str,
                 cfg: IndexConfig) -> None:
        manifest = read_json(os.path.join(index_dir, "manifest.json"))
        with self._locked():
            # locked read-modify-write: two registrars in different
            # processes must not clobber each other's tenants
            self.refresh()
            self._catalog[str(tenant)] = {
                "index_dir": os.path.abspath(index_dir),
                "config": cfg.to_dict(),
                "n_docs": manifest["n_docs"],
            }
            atomic_write_json(self.path, self._catalog)
        # re-pointing a tenant (rebuild/upgrade) must not keep serving
        # from a Searcher opened on the OLD directory
        self.evict(tenant)

    def unregister(self, tenant: str, destroy: bool = False) -> None:
        """Remove a tenant from the catalog (closing its searchers);
        ``destroy=True`` also deletes the tenant's index directory —
        refused when another registered tenant still points at it (the
        check AND the delete run under the catalog lock, so a concurrent
        register can't slip a new tenant onto the dir mid-destroy)."""
        t = str(tenant)
        with self._locked():
            self.refresh()
            entry = self._catalog.get(t)
            if entry is None:
                raise KeyError(f"unknown tenant {tenant!r}")
            if destroy:
                # validate BEFORE mutating: a refused destroy must leave
                # the tenant registered, not half-removed
                shared = [o for o, e in self._catalog.items()
                          if o != t
                          and e["index_dir"] == entry["index_dir"]]
                if shared:
                    raise ValueError(
                        f"index dir {entry['index_dir']} is still used "
                        f"by tenant(s) {shared}; not destroying")
            self._catalog.pop(t)
            atomic_write_json(self.path, self._catalog)
            self.evict(t)
            if destroy:
                import shutil
                shutil.rmtree(entry["index_dir"], ignore_errors=True)

    def tenants(self) -> list[str]:
        return sorted(self._catalog)

    def entry(self, tenant: str) -> dict:
        try:
            return self._catalog[str(tenant)]
        except KeyError:
            raise KeyError(f"unknown tenant {tenant!r}; registered: "
                           f"{self.tenants()}") from None

    def index_dir(self, tenant: str) -> str:
        return self.entry(tenant)["index_dir"]

    def config(self, tenant: str) -> IndexConfig:
        return IndexConfig.from_dict(self.entry(tenant)["config"])

    # ---------------- routing ----------------

    def searcher(self, tenant: str, num_readers: int = 2) -> Searcher:
        """Per-tenant Searcher, cached per (tenant, pool size) — the
        routing layer: a tenant's queries only ever touch its own index
        directory and reader actors."""
        key = (str(tenant), num_readers)
        cur_dir = self.index_dir(tenant)
        s = self._searchers.get(key)
        if s is not None and self._opened_dirs.get(key) != cur_dir:
            # the catalog (possibly via refresh() after a cross-process
            # re-point) names a DIFFERENT directory than this Searcher
            # was opened on — close it rather than serve stale results
            self._searchers.pop(key).close()
            s = None
        if s is None or not s.readers:
            s = Searcher(cur_dir, num_readers=num_readers)
            self._searchers[key] = s
            self._opened_dirs[key] = cur_dir
        return s

    def evict(self, tenant: str) -> None:
        """Close any cached Searcher for ``tenant`` — required after an
        IN-PLACE content change to its index directory (append / repair
        commit), which the opened-dir check cannot detect."""
        for key in [k for k in self._searchers if k[0] == str(tenant)]:
            self._searchers.pop(key).close()
            self._opened_dirs.pop(key, None)

    def count_all(self, query) -> dict[str, int]:
        """Fan a count query to EVERY tenant (each against its own
        index); returns tenant → count, sorted by tenant id."""
        return {t: self.searcher(t).count(query) for t in self.tenants()}

    def close(self) -> None:
        for s in self._searchers.values():
            s.close()
        self._searchers.clear()
        self._opened_dirs.clear()
