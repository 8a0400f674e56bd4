"""Shared helpers for importer coverage assertions (VERDICT r4 #8): every
synthesized reference key must be CONSUMED by the name map, and every df3d
param/stat leaf must be WRITTEN by it. Catches silent key-coverage drift
(renamed reference keys, new df3d params) that shape-only spot checks miss.
"""

from __future__ import annotations


class TrackingDict(dict):
    """dict that records every key read via __getitem__/get."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.accessed.add(k)
        return super().get(k, default)


def leaf_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= leaf_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def assert_two_way_coverage(sd: TrackingDict, imported_trees, flax_trees,
                            ignore_torch=(), ignore_flax=()):
    """sd: the synthesized state dict (TrackingDict) AFTER the name map ran;
    imported_trees / flax_trees: matching lists of (params-like) dicts.
    ignore_torch: torch key substrings allowed to stay unconsumed (e.g.
    num_batches_tracked); ignore_flax: flax path-tuple prefixes the map is
    documented not to cover."""
    unconsumed = {
        k for k in sd
        if k not in sd.accessed
        and not any(s in k for s in ignore_torch)
    }
    assert not unconsumed, f"torch keys never consumed: {sorted(unconsumed)}"

    for imported, flax in zip(imported_trees, flax_trees):
        want = {
            p for p in leaf_paths(flax)
            if not any(p[: len(pre)] == tuple(pre) for pre in ignore_flax)
        }
        got = leaf_paths(imported)
        missing = want - got
        extra = got - want
        assert not missing, f"df3d leaves never written: {sorted(missing)}"
        assert not extra, f"imported leaves not in the model: {sorted(extra)}"
