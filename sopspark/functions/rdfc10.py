"""RDFC-1.0 (W3C RDF Dataset Canonicalization) kernel, pure Python.

Implements the published W3C RDFC-1.0 algorithm (the URDNA2015 successor):
first-degree hashing, N-degree hashing with permutation exploration, and
canonical ``c14nN`` label issuance. This is the sequential kernel; the
distributed orchestration lives in
:mod:`sopspark.operators.canonicalize`.

Reference behavior mirrored (not ported): ``sop canonicalize`` collects the
deduplicated dataset and runs RDFC-1.0 with SHA-256/384 and
poison-resistance limits (``src/canonicalize.rs:55-99``; knobs at
``src/canonicalize.rs:80-81``). The poison knobs here bound total N-degree
recursion and per-group permutations the same way: adversarially
automorphic graphs abort with :class:`PoisonedGraphError` instead of
burning CPU.

Quads are tuples ``(s, p, o, g)`` of term tuples ``(kind, value, dt, lang)``
with ``g = None`` for the default graph (the plain-Python twin of the
DataFrame schema, :mod:`sopspark.terms`).
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from sopspark.terms import BNODE, py_nt_term

__all__ = ["canonicalize_quads", "rdfc10_issue", "rdfc10_sort_keys", "PoisonedGraphError"]


class PoisonedGraphError(RuntimeError):
    pass


class _Issuer:
    def __init__(self, prefix: str, start: int = 0):
        self.prefix = prefix
        self.counter = start
        self.issued: dict[str, str] = {}
        self.order: list[str] = []

    def issue(self, label: str) -> str:
        if label not in self.issued:
            self.issued[label] = f"{self.prefix}{self.counter}"
            self.counter += 1
            self.order.append(label)
        return self.issued[label]

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix, self.counter)
        c.issued = dict(self.issued)
        c.order = list(self.order)
        return c


def _serialize_quad(quad: tuple, subst: dict[str, str] | None = None) -> str:
    """Canonical N-Quads line with optional bnode-label substitution."""
    parts = []
    for i, term in enumerate(quad):
        if term is None:
            continue
        if term[0] == BNODE and subst is not None:
            parts.append("_:" + subst.get(term[1], "z"))
        else:
            parts.append(py_nt_term(term))
    return " ".join(parts) + " .\n"


class _State:
    def __init__(self, quads, hash_name: str, depth_factor: float, permutation_limit: int):
        self.hash_name = hash_name
        self.bnode_quads: dict[str, list[tuple]] = {}
        self.quads = quads
        for q in quads:
            for term in (q[0], q[1], q[2], q[3]):
                if term is not None and term[0] == BNODE:
                    self.bnode_quads.setdefault(term[1], []).append(q)
        self.canonical = _Issuer("c14n")
        n = max(1, len(self.bnode_quads))
        self.max_calls = int(depth_factor * n * n) + n + 16
        self.calls = 0
        self.permutation_limit = permutation_limit

    def hash(self, data: str) -> str:
        return hashlib.new(self.hash_name, data.encode("utf-8")).hexdigest()

    # --- 4.6 Hash First Degree Quads ---
    def hash_first_degree(self, bn: str) -> str:
        nquads = []
        for q in self.bnode_quads[bn]:
            subst = {}
            for term in (q[0], q[1], q[2], q[3]):
                if term is not None and term[0] == BNODE:
                    subst[term[1]] = "a" if term[1] == bn else "z"
            nquads.append(_serialize_quad(q, subst))
        return self.hash("".join(sorted(nquads)))

    # --- 4.7 Hash Related Blank Node ---
    def hash_related(self, related: str, quad: tuple, issuer: _Issuer, position: str) -> str:
        data = position
        if position != "g":
            data += "<" + quad[1][1] + ">"
        if related in self.canonical.issued:
            data += "_:" + self.canonical.issued[related]
        elif related in issuer.issued:
            data += "_:" + issuer.issued[related]
        else:
            data += self.hash_first_degree(related)
        return self.hash(data)

    # --- 4.8 Hash N-Degree Quads ---
    def hash_n_degree(self, identifier: str, issuer: _Issuer) -> tuple[str, _Issuer]:
        self.calls += 1
        if self.calls > self.max_calls:
            raise PoisonedGraphError(
                f"N-degree hashing exceeded {self.max_calls} calls (poison resistance)"
            )
        hn: dict[str, list[str]] = {}
        for quad in self.bnode_quads[identifier]:
            for term, position in ((quad[0], "s"), (quad[2], "o"), (quad[3], "g")):
                if term is not None and term[0] == BNODE and term[1] != identifier:
                    h = self.hash_related(term[1], quad, issuer, position)
                    lst = hn.setdefault(h, [])
                    if term[1] not in lst:
                        lst.append(term[1])

        data_to_hash = ""
        for h in sorted(hn):
            data_to_hash += h
            chosen_path = ""
            chosen_issuer = issuer
            group = hn[h]
            if len(group) > self.permutation_limit:
                raise PoisonedGraphError(
                    f"related-bnode group of size {len(group)} exceeds permutation limit "
                    f"{self.permutation_limit}"
                )
            for perm in permutations(group):
                issuer_copy = issuer.copy()
                path = ""
                recursion_list: list[str] = []
                skip = False
                for related in perm:
                    if related in self.canonical.issued:
                        path += "_:" + self.canonical.issued[related]
                    else:
                        if related not in issuer_copy.issued:
                            recursion_list.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                for related in recursion_list:
                    result_hash, result_issuer = self.hash_n_degree(related, issuer_copy)
                    path += "_:" + issuer_copy.issue(related)
                    path += "<" + result_hash + ">"
                    issuer_copy = result_issuer
                    if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data_to_hash += chosen_path
            issuer = chosen_issuer
        return self.hash(data_to_hash), issuer


def _run(quads, hash_name, depth_factor, permutation_limit):
    """Main loop (spec 4.4). Returns (state, per-bnode sort keys)."""
    state = _State(quads, hash_name, depth_factor, permutation_limit)
    fd: dict[str, str] = {bn: state.hash_first_degree(bn) for bn in state.bnode_quads}
    hash_to_bn: dict[str, list[str]] = {}
    for bn, h in fd.items():
        hash_to_bn.setdefault(h, []).append(bn)

    sort_keys: dict[str, tuple] = {}
    # step 5: unique first-degree hashes issued in hash order
    for h in sorted(hash_to_bn):
        bns = hash_to_bn[h]
        if len(bns) == 1:
            state.canonical.issue(bns[0])
            sort_keys[bns[0]] = (0, h, "", 0)
    # step 6: shared hashes → N-degree exploration
    for h in sorted(hash_to_bn):
        bns = hash_to_bn[h]
        if len(bns) <= 1:
            continue
        results = []
        for bn in bns:
            if bn in state.canonical.issued:
                continue
            temp = _Issuer("b")
            temp.issue(bn)
            nd_hash, nd_issuer = state.hash_n_degree(bn, temp)
            results.append((nd_hash, nd_issuer))
        for nd_hash, nd_issuer in sorted(results, key=lambda r: r[0]):
            for idx, node in enumerate(nd_issuer.order):
                state.canonical.issue(node)
                sort_keys.setdefault(node, (1, h, nd_hash, idx))
    return state, sort_keys


def rdfc10_issue(
    quads,
    hash_name: str = "sha256",
    depth_factor: float = 1.0,
    permutation_limit: int = 6,
) -> dict[str, str]:
    """Quad list → {original bnode label: canonical label (c14nN)}."""
    state, _ = _run(quads, hash_name, depth_factor, permutation_limit)
    return dict(state.canonical.issued)


def rdfc10_sort_keys(
    quads,
    hash_name: str = "sha256",
    depth_factor: float = 1.0,
    permutation_limit: int = 6,
) -> dict[str, str]:
    """Quad list → {bnode label: global sort key string}.

    For the distributed per-component path: keys from independent components
    are globally sortable — phase 0 (unique first-degree hash) precedes
    phase 1 (N-degree), matching the spec's issuance order; within phase by
    (first-degree hash, N-degree result hash, temp-issue order). Exact
    w.r.t. the global algorithm except when a canonical label issued inside
    phase 1 feeds a *later* group's hash input (cross-group numbering —
    requires nested automorphic structures; such datasets should use the
    single-kernel path)."""
    _, keys = _run(quads, hash_name, depth_factor, permutation_limit)
    return {bn: f"{p}|{fd}|{nd}|{idx:08d}" for bn, (p, fd, nd, idx) in keys.items()}


def canonicalize_quads(
    quads,
    hash_name: str = "sha256",
    depth_factor: float = 1.0,
    permutation_limit: int = 6,
) -> list[str]:
    """Full sequential c14n: deduplicated quad list → sorted canonical
    N-Quads lines (no trailing newline), bnodes relabeled ``c14nN``."""
    uniq = list(dict.fromkeys(quads))
    issued = rdfc10_issue(uniq, hash_name, depth_factor, permutation_limit)
    lines = {_serialize_quad(q, issued).rstrip("\n") for q in uniq}
    return sorted(lines)
