"""Bounded session-artifact registry (r11 VERDICT #3 / ADVICE).

Every trained-state family the engine keeps session-resident — BPE
merge relations, IVF codebooks + materialized inverted-list index,
k-means centroids, PQ codebooks + coarse centroids + encoded corpus,
the SemDeDup cluster index, the stream quantize codebooks — lives in
a module-level dict keyed by (applicationId, cache_key, params...).
The keying is correct (value fingerprints make stale state unservable)
but until r12 nothing BOUNDED the dicts: a long-lived session cycling
many corpora would grow driver memory and — worse — the eagerly-pinned
localCheckpoint relations (the SemDeDup cluster index, the PQ encoded
corpus) would hold executor block-store bytes for the session
lifetime, exactly the block class ``tools/paired_sf1._settle`` must
NOT free (the Python-side dicts hold their proxies on purpose).

This registry adds the missing bound in the ``PROBE_CAP`` /
``guarded_window`` spirit — loud, not silent:

* every family dict registers here (it stays a PLAIN dict, so tests
  may still ``.clear()`` / introspect it directly; the LRU sidecar
  prunes out-of-band removals lazily);
* ``put`` can declare a SUPERSEDE PREFIX: a new entry whose leading
  identity components (applicationId, tag, cache_key, params) match
  an existing key but whose trailing VALUE components (codebook
  fingerprint, corpus plan hash) differ evicts the superseded entry
  — a retrained codebook under the same cache_key no longer leaves
  the old pinned relation held forever (r11 ADVICE);
* the TOTAL key count across all families is capped at
  :data:`ARTIFACT_KEY_CAP`; over the cap the least-recently-USED
  entry is evicted with a loud stderr line (eviction is always
  correct — the artifact pattern's value-identity contract means an
  evicted entry is simply rebuilt, bill-the-first-builder, on next
  use; pinned in tests/test_dedup_similarity.py).

Eviction releases pinned relations the way the engine's own block
lifecycle works (see ``_settle``'s docstring): the Python reference is
dropped, the JVM-side Dataset becomes unreachable, and ONE explicit
``System.gc()`` cycles ContextCleaner so the localCheckpoint blocks
free NOW instead of at an arbitrary future allocation stall.  There is
no public Dataset-level unpersist for checkpoint blocks — reference
drop + cleaner cycle IS the release mechanism.
"""

from __future__ import annotations

import sys
from collections import OrderedDict

#: total session-artifact entries across ALL registered families.
#: A full bench sweep over one fixture dir holds ~20 keys; the cap
#: gives a corpus-cycling session ~3 fixtures of headroom before LRU
#: eviction starts trading rebuild cost for bounded memory.
ARTIFACT_KEY_CAP = 64

_FAMILIES: dict[int, tuple[str, dict]] = {}
_LRU: OrderedDict[tuple[int, tuple], None] = OrderedDict()


def register(name: str, family: dict) -> dict:
    """Enroll a family dict in the global bound; returns it unchanged."""
    _FAMILIES[id(family)] = (name, family)
    return family


def get(family: dict, key):
    """Cache lookup with LRU touch.  ``key=None`` (cache bypass, the
    crossover-harness contract) always misses."""
    if key is None:
        return None
    hit = family.get(key)
    if hit is not None:
        _LRU.pop((id(family), key), None)
        _LRU[(id(family), key)] = None
    return hit


def _release(family_name: str, key, value, why: str) -> bool:
    """Drop an entry's pinned relations (if any).  Returns True when
    the value held a DataFrame — the caller cycles ContextCleaner once
    per put, not per entry."""
    held = [v for v in (value if isinstance(value, tuple) else (value,))
            if hasattr(v, "sparkSession")]
    print(f"session-artifact registry: evicting {family_name}"
          f"[{key[1] if len(key) > 1 else key}] ({why}; "
          f"{len(held)} pinned relation(s) released to ContextCleaner)",
          file=sys.stderr)
    return bool(held)


def _cleaner_cycle(value) -> None:
    """One explicit JVM GC so ContextCleaner frees the just-dropped
    checkpoint blocks now (the ``_settle`` mechanism).  Best-effort:
    a stopped session has nothing left to free."""
    for v in (value if isinstance(value, tuple) else (value,)):
        if hasattr(v, "sparkSession"):
            try:
                v.sparkSession.sparkContext._jvm.System.gc()
            except Exception:
                pass
            return


def put(family: dict, key, value, *, supersede_prefix: int | None = None):
    """Insert ``value`` under ``key``, evicting (a) entries this key
    SUPERSEDES — same first ``supersede_prefix`` identity components,
    different trailing value components (retrained codebook / changed
    corpus under the same cache_key) — and (b) global-LRU entries past
    :data:`ARTIFACT_KEY_CAP`."""
    if key is None:
        return value
    fname = _FAMILIES.get(id(family), ("<unregistered>", family))[0]
    dropped = []
    if supersede_prefix is not None:
        stale = [k for k in family
                 if k != key and len(k) == len(key)
                 and k[:supersede_prefix] == key[:supersede_prefix]]
        for k in stale:
            v = family.pop(k)
            _LRU.pop((id(family), k), None)
            if _release(fname, k, v, "superseded"):
                dropped.append(v)
    family[key] = value
    _LRU.pop((id(family), key), None)
    _LRU[(id(family), key)] = None

    # lazily prune LRU entries removed out-of-band (tests .clear() the
    # dicts directly), then enforce the global cap — never evicting
    # the entry just inserted
    total = sum(len(f) for _, f in _FAMILIES.values())
    if total > ARTIFACT_KEY_CAP:
        for fid, k in list(_LRU):
            nm, f = _FAMILIES.get(fid, (None, None))
            if f is None or k not in f:
                _LRU.pop((fid, k), None)
        while (sum(len(f) for _, f in _FAMILIES.values())
               > ARTIFACT_KEY_CAP and len(_LRU) > 1):
            (fid, k), _ = _LRU.popitem(last=False)
            if fid == id(family) and k == key:
                _LRU[(fid, k)] = None  # re-add the fresh entry at MRU
                continue
            nm, f = _FAMILIES[fid]
            v = f.pop(k, None)
            if v is not None and _release(nm, k, v, "LRU over "
                                          f"ARTIFACT_KEY_CAP={ARTIFACT_KEY_CAP}"):
                dropped.append(v)
    for v in dropped:
        _cleaner_cycle(v)
        break  # one cycle frees everything dropped this put
    return value


def plan_fingerprint(df) -> int:
    """Cheap corpus fingerprint for artifact keys (r11 ADVICE): the
    canonicalized logical-plan hash (``DataFrame.semanticHash`` — one
    client-side analysis call, ~30 ms, no job).  Two callers deriving
    the same corpus through the same relational steps get the same
    hash (x97/x103 share one SemDeDup index: verified), while a
    DIFFERENT corpus reusing a cache_key now keys a fresh entry
    instead of silently serving a stale index."""
    return int(df.semanticHash())
