"""Vectorized batch scanner for the term matcher — the r4 matcher engine.

The r3 worker profile put ~75% of ``find_batch`` in the two regex C scans
(explicit-id shapes + dictionary trie) plus per-match Python processing
(VERDICT r3 next #2).  This module re-expresses the whole batch scan as
numpy array passes over the byte haystack.

Design constraint (measured on this VM, see the sandbox perf memory):
memory bandwidth is the budget, not FLOPs — a full-length int64 helper array
costs ~100 ms per 10 M chars.  So the scan touches the haystack only through
a handful of uint8/bool class arrays (one pass each) and does ALL remaining
work on token-sized or candidate-sized arrays:

- **anchors** for explicit ids: every ``:`` / ``_`` with exactly 7 digits
  after (eight gathers on the anchor array), prefix runs resolved by a
  bounded walk-back loop (max known prefix length, candidate-sized);
- **token matching** for dictionary surfaces: ``[a-z0-9]+`` runs from one
  diff/flatnonzero pass, token hashes by a length-bounded loop of
  ``h = h*B + byte`` steps (sum-of-token-lengths work), matched with
  ``np.searchsorted`` against the surface hash tables (single- and
  two-token with the separator mixed in);
- **byte-exact verification** of every accepted candidate (grouped per
  surface / per prefix, one vector compare per group) — the hash only
  routes, so a collision can never fabricate a mention;
- **vectorized sweep**: one global lexsort by (start, -end, priority,
  -score, term-rank) and a single cheap greedy pass for the leftmost-longest
  resolution (rows need no special casing: candidates never span the NUL
  separator).

Semantics are pinned to the regex matcher (`dictionary.TermMatcher.find`) by
the property suite (batched-vs-per-row) and the pure-Python oracle parity
tests; non-ASCII batches and surfaces that do not fit the token model fall
back to the regex path (`TermMatcher` keeps both).

Reference analog: the single pass replaces the reference's per-file regex
scans (/root/reference/kg_obo/transform.py:223-346,501-523) at Arrow-batch
granularity.
"""

from __future__ import annotations

import re

import numpy as np

_B = np.uint64(1099511628211)  # FNV-1a prime
_PAIR_K = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant for pair mixing
_M64 = (1 << 64) - 1

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_MAX_CHAIN = 8  # longest surface, in tokens, the chain tables cover



def _poly_hash_bytes(bs: bytes) -> int:
    """h = h*B + byte over the bytes, mod 2**64 — the builder-side twin of
    the scanner's bounded hash loop."""
    h = 0
    for b in bs:
        h = (h * 1099511628211 + b) & _M64
    return h


def _pair_key(h1: int, sep: int, h2: int) -> int:
    k = int(_PAIR_K)
    return ((h1 * k) ^ (sep * 1099511628211) ^ ((h2 ^ (h2 >> 29)) * k)) & _M64


class VectorScanner:
    """Compiled vectorized scanner over one matcher's dictionary + id rules.

    Built lazily per worker next to the regex matcher (see
    ``dictionary.get_matcher``); ``scan`` consumes the NUL-joined batch
    haystack and returns columnar candidates for the sweep.
    """

    def __init__(
        self,
        surface_map: dict[str, list[tuple[str, float, str]]],
        known_prefixes: set[str],
        known_ids: set[str],
        iri_prefix: str,
        level: int,
    ):
        self.level = level
        self.iri_prefix = iri_prefix
        self._iri_bytes = np.frombuffer(iri_prefix.encode(), dtype=np.uint8)

        # ---- term-id string table; index = rank = lexicographic order -----
        dict_tids = {e[0] for v in surface_map.values() for e in v}
        self._tid_strings = np.array(sorted(known_ids | dict_tids), dtype=object)
        self._tid_rank = {t: i for i, t in enumerate(self._tid_strings)}

        # ---- explicit-id tables -------------------------------------------
        # "OBO" stays in the table: the regex engine (dictionary.py
        # _collect_id_cands) rejects only the exact-uppercase surface "OBO:",
        # so case variants like obo:0000001 must still resolve when OBO is a
        # known prefix. The plain-CURIE branch applies the same surface rule.
        self._prefixes = sorted(known_prefixes)
        self._obo_pfx_idx = (
            self._prefixes.index("OBO") if "OBO" in self._prefixes else -1
        )
        self._pfx_lower = [
            np.frombuffer(p.lower().encode(), dtype=np.uint8) for p in self._prefixes
        ]
        self._max_pfx = max((len(p) for p in self._prefixes), default=0)
        keys = []
        key_tid_rank = []
        pfx_index = {p: i for i, p in enumerate(self._prefixes)}
        for tid in known_ids:
            pfx, num = tid.split(":")
            if pfx in pfx_index and num.isdigit() and len(num) == 7:
                k = pfx_index[pfx] * 10_000_000 + int(num)
                keys.append(k)
                key_tid_rank.append(self._tid_rank[tid])
        if keys:
            order = np.argsort(np.asarray(keys, dtype=np.int64))
            self._id_keys = np.asarray(keys, dtype=np.int64)[order]
            self._id_key_rank = np.asarray(key_tid_rank, dtype=np.int64)[order]
        else:
            self._id_keys = np.empty(0, np.int64)
            self._id_key_rank = np.empty(0, np.int64)

        # ---- dictionary surface tables ------------------------------------
        # token model: surface == tok ((' '|'-') tok)*, tok = [a-z0-9]+, up to
        # _MAX_CHAIN tokens. Chain key = pair-fold of token hashes with the
        # separator byte mixed in at each step; one hash table per chain len.
        self._residual: list[str] = []  # surfaces outside the token model
        surf_list: list[str] = []
        tables: dict[int, tuple[list[int], list[int]]] = {}
        max_tok = 0
        max_chain = 0
        for surf in surface_map:
            toks = _TOKEN_RE.findall(surf)
            parts = _TOKEN_RE.split(surf)
            seps = parts[1:-1]
            if (
                1 <= len(toks) <= _MAX_CHAIN
                and parts[0] == ""
                and parts[-1] == ""
                and len(seps) == len(toks) - 1
                and all(s in (" ", "-") for s in seps)
            ):
                si = len(surf_list)
                surf_list.append(surf)
                key = _poly_hash_bytes(toks[0].encode())
                for s, t in zip(seps, toks[1:]):
                    key = _pair_key(key, ord(s), _poly_hash_bytes(t.encode()))
                ks, vs = tables.setdefault(len(toks), ([], []))
                ks.append(key)
                vs.append(si)
                max_tok = max(max_tok, max(len(t) for t in toks))
                max_chain = max(max_chain, len(toks))
            else:
                self._residual.append(surf)
        self._max_tok = max_tok
        self._max_chain = max_chain
        # distinct-key requirement: same-hash surfaces would mis-route; the
        # byte verify would then silently DROP one of them, so fall back
        self._hash_collision = any(
            len(set(ks)) != len(ks) for ks, _ in tables.values()
        )
        self._tables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for ln, (ks, vs) in tables.items():
            ka = np.asarray(ks, dtype=np.uint64)
            va = np.asarray(vs, dtype=np.int64)
            o = np.argsort(ka)
            self._tables[ln] = (ka[o], va[o])

        self._surfaces = surf_list
        self._surf_bytes = [np.frombuffer(s.encode(), dtype=np.uint8) for s in surf_list]
        # padded (n_surfaces, max_len) byte matrix + length vector: lets the
        # scan verify ALL candidates in one vectorized compare instead of a
        # per-surface-group Python loop (r8; measured 16x on the verify step)
        _max_sb = max((b.size for b in self._surf_bytes), default=0)
        self._surf_len = np.array(
            [b.size for b in self._surf_bytes], dtype=np.int64
        )
        self._surf_mat = np.zeros((len(self._surf_bytes), _max_sb), dtype=np.uint8)
        for _i, _b in enumerate(self._surf_bytes):
            self._surf_mat[_i, : _b.size] = _b
        # (token length, first byte) prefilter LUT: only tokens whose combo
        # appears among surface tokens get hashed at all — most corpus tokens
        # are rejected by two gathers instead of a full hash loop
        self._tok_lut = np.zeros((max_tok + 1) * 256, dtype=bool)
        for surf in surf_list:
            for t in _TOKEN_RE.findall(surf):
                self._tok_lut[len(t) * 256 + ord(t[0])] = True
        # flattened (tid_rank, base_score, exact_is_lower, exact) entry table
        ent_rank: list[int] = []
        ent_base: list[float] = []
        ent_exact_lower: list[bool] = []
        ent_exact: list[str] = []
        ent_start = np.zeros(len(surf_list) + 1, dtype=np.int64)
        for i, s in enumerate(surf_list):
            for tid, base, exact in surface_map[s]:
                ent_rank.append(self._tid_rank[tid])
                ent_base.append(base)
                ent_exact_lower.append(exact == s)
                ent_exact.append(exact)
            ent_start[i + 1] = len(ent_rank)
        self._ent_start = ent_start
        self._ent_rank = np.asarray(ent_rank, dtype=np.int64)
        self._ent_base = np.asarray(ent_base, dtype=np.float64)
        self._ent_exact_lower = np.asarray(ent_exact_lower, dtype=bool)
        self._ent_exact = ent_exact

        # residual surfaces keep a (tiny) trie regex — usually empty
        if self._residual:
            from kg_obo_spark.dictionary import _trie_pattern

            self._residual_re = re.compile(
                r"(?<![A-Za-z0-9_])"
                + _trie_pattern(sorted(self._residual, key=len, reverse=True))
                + r"(?![A-Za-z0-9_-])"
            )
        else:
            self._residual_re = None
        self._surface_map = surface_map

    # ------------------------------------------------------------------ scan

    def scan(self, big: str):
        """Candidate arrays over the NUL-joined haystack: a dict of numpy
        arrays (start, end, prio, score, rank) where rank indexes
        ``self._tid_strings``. Returns None when the haystack is outside the
        fast path (non-ASCII) or the table build hit a hash collision."""
        if self._hash_collision or not big.isascii():
            return None
        a = np.frombuffer(big.encode("ascii"), dtype=np.uint8)
        n = a.shape[0]
        if n == 0:
            return self._empty()
        # the only full-length arrays: byte classes + the lowered haystack
        is_digit = (a >= 48) & (a <= 57)
        upper = (a >= 65) & (a <= 90)
        is_alpha = upper | ((a >= 97) & (a <= 122))
        al = np.where(upper, a + np.uint8(32), a)

        parts = [
            self._scan_ids(big, a, al, n, is_digit, is_alpha, upper),
            self._scan_dict(big, a, al, n, is_alpha, is_digit, upper),
        ]
        parts = [p for p in parts if p is not None and p["start"].size]
        if not parts:
            return self._empty()
        return {
            k: np.concatenate([p[k] for p in parts])
            for k in ("start", "end", "prio", "score", "rank")
        }

    def _empty(self):
        return {
            "start": np.empty(0, np.int64),
            "end": np.empty(0, np.int64),
            "prio": np.empty(0, np.int64),
            "score": np.empty(0, np.float64),
            "rank": np.empty(0, np.int64),
        }

    # -------------------------------------------------------------- id scan

    def _scan_ids(self, big, a, al, n, is_digit, is_alpha, upper):
        """All explicit-id shapes: PREFIX:1234567 (any prefix case),
        OBO:PREFIX_1234567[.OWL# variant], and raw OBO IRIs — anchored on the
        ':'/'_' byte followed by exactly 7 digits. Everything after anchor
        detection is candidate-sized."""
        starts: list[np.ndarray] = []
        ends: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        ranks: list[np.ndarray] = []
        maxp = self._max_pfx
        if maxp == 0 or self._id_keys.size == 0:
            return None

        def seven_digits_after(p: np.ndarray) -> np.ndarray:
            ok = p + 8 <= n
            pc = np.where(ok, p, 0)
            for k in range(1, 8):
                ok &= is_digit[np.minimum(pc + k, n - 1)]
            after = pc + 8
            ok &= (after >= n) | ~is_digit[np.minimum(after, n - 1)]
            return ok

        def prefix_run(p: np.ndarray):
            """(run_start, ok) for the alpha run ending at p-1 (inclusive);
            bounded walk-back of max-known-prefix steps."""
            ps = p.copy()
            for _ in range(maxp):
                can = ps > 0
                can &= is_alpha[np.where(can, ps - 1, 0)]
                ps = np.where(can, ps - 1, ps)
            too_long = ps > 0
            too_long &= is_alpha[np.where(too_long, ps - 1, 0)]
            return ps, (~too_long) & (ps < p)

        def prefix_indices(ps: np.ndarray, pe: np.ndarray) -> np.ndarray:
            """Prefix-table index per candidate by direct (lowered) byte
            compare against each known prefix — no hashing, candidate-sized."""
            idx = np.full(ps.shape[0], -1, dtype=np.int64)
            plen = pe - ps
            for i, pb in enumerate(self._pfx_lower):
                g = np.flatnonzero(plen == pb.shape[0])
                if g.size:
                    mat = al[ps[g, None] + np.arange(pb.shape[0])]
                    idx[g[(mat == pb).all(axis=1)]] = i
            return idx

        def number_value(p: np.ndarray) -> np.ndarray:
            v = np.zeros(p.shape[0], dtype=np.int64)
            for k in range(7):
                v = v * 10 + (a[p + 1 + k].astype(np.int64) - 48)
            return v

        def resolve_known(pfx_idx: np.ndarray, num: np.ndarray):
            key = pfx_idx * 10_000_000 + num
            pos = np.searchsorted(self._id_keys, key)
            pos_c = np.minimum(pos, self._id_keys.size - 1)
            ok = (pos < self._id_keys.size) & (self._id_keys[pos_c] == key)
            return ok, self._id_key_rank[pos_c]

        def has_lower(ps: np.ndarray, pe: np.ndarray) -> np.ndarray:
            """any lowercase byte in [ps, pe), spans bounded by maxp."""
            out = np.zeros(ps.shape[0], dtype=bool)
            for k in range(maxp):
                in_span = ps + k < pe
                ch = a[np.where(in_span, ps + k, 0)]
                out |= in_span & (ch >= 97) & (ch <= 122)
            return out

        # ---- plain CURIE: (?<![A-Za-z0-9_:]) [A-Za-z]+ : \d{7} (?!\d) -----
        c = np.flatnonzero(a == 58)
        if c.size:
            c = c[seven_digits_after(c)]
            c = c[c > 0]
            c = c[is_alpha[c - 1]]
        if c.size:
            ps, run_ok = prefix_run(c)
            # lookbehind [^A-Za-z0-9_:] before the prefix run
            hasb = ps > 0
            bchar = a[np.where(hasb, ps - 1, 0)]
            run_ok &= ~(
                hasb & (((bchar >= 48) & (bchar <= 57)) | (bchar == 95) | (bchar == 58))
            )
            c, ps = c[run_ok], ps[run_ok]
        if c.size:
            pidx = prefix_indices(ps, c)
            keep = pidx >= 0
            c, ps, pidx = c[keep], ps[keep], pidx[keep]
        if c.size:
            isupper = ~has_lower(ps, c)
            if self._obo_pfx_idx >= 0:
                # regex rule: only the exact-uppercase "OBO:" surface is
                # excluded; obo:/Obo: variants still repair at 0.97
                keep = ~((pidx == self._obo_pfx_idx) & isupper)
                c, ps, pidx, isupper = c[keep], ps[keep], pidx[keep], isupper[keep]
            if self.level >= 3:
                c, ps, pidx, isupper = c[isupper], ps[isupper], pidx[isupper], isupper[isupper]
        if c.size:
            ok, rank = resolve_known(pidx, number_value(c))
            c, ps, rank, isupper = c[ok], ps[ok], rank[ok], isupper[ok]
            starts.append(ps)
            ends.append(c + 8)
            scores.append(np.where(isupper, 1.0, 0.97))
            ranks.append(rank)

        # ---- OBO:/IRI shapes, anchored on '_' + 7 digits ------------------
        if self.level < 3:
            u = np.flatnonzero(a == 95)
            if u.size:
                u = u[seven_digits_after(u)]
                u = u[u > 0]
                u = u[is_alpha[u - 1]]
            if u.size:
                ps, run_ok = prefix_run(u)
                u, ps = u[run_ok], ps[run_ok]
            if u.size:
                pidx = prefix_indices(ps, u)
                keep = pidx >= 0
                u, ps, pidx = u[keep], ps[keep], pidx[keep]
            if u.size:
                ok, rank = resolve_known(pidx, number_value(u))
                u, ps, rank = u[ok], ps[ok], rank[ok]
            if u.size:
                # direct OBO form: literal uppercase "OBO:" right before the
                # prefix, with the [^A-Za-z0-9_:] lookbehind before the O
                p4 = ps - 4
                direct = p4 >= 0
                i0 = np.where(direct, p4, 0)
                direct &= (
                    (a[i0] == 79) & (a[i0 + 1] == 66) & (a[i0 + 2] == 79) & (a[i0 + 3] == 58)
                )
                hasb = direct & (p4 - 1 >= 0)
                bchar = a[np.where(hasb, p4 - 1, 0)]
                direct &= ~(
                    hasb
                    & (
                        ((bchar >= 65) & (bchar <= 90))
                        | ((bchar >= 97) & (bchar <= 122))
                        | ((bchar >= 48) & (bchar <= 57))
                        | (bchar == 95)
                        | (bchar == 58)
                    )
                )
                # raw IRI form: the full IRI prefix right before
                L = self._iri_bytes.shape[0]
                pi = ps - L
                iri = pi >= 0
                cand = np.flatnonzero(iri)
                if cand.size:
                    mat = a[pi[cand, None] + np.arange(L)]
                    iri[cand] = (mat == self._iri_bytes).all(axis=1)
                # rare OWL# form: deterministic walk-back per candidate over
                # "OBO:" [A-Za-z]+ ".OWL" right before the '#' at ps-1 —
                # mirrors the possessive regex branch exactly (maximal alpha
                # run, unbounded name length, no shared-window confusion
                # between adjacent mentions)
                owl_start = np.full(u.shape[0], -1, dtype=np.int64)
                maybe = np.flatnonzero(
                    ~direct & ~iri & (ps > 0) & (a[np.maximum(ps - 1, 0)] == 35)
                )
                for j in maybe:
                    p = int(ps[j])  # '#' sits at p-1
                    # ".OWL" immediately before the '#'
                    if p < 10 or not (
                        a[p - 2] == 76  # L
                        and a[p - 3] == 87  # W
                        and a[p - 4] == 79  # O
                        and a[p - 5] == 46  # .
                    ):
                        continue
                    q = p - 5  # walk back over the [A-Za-z]+ ontology name
                    while q > 0 and is_alpha[q - 1]:
                        q -= 1
                    if q == p - 5 or q < 4:  # empty name / no room for OBO:
                        continue
                    if not (
                        a[q - 4] == 79  # O
                        and a[q - 3] == 66  # B
                        and a[q - 2] == 79  # O
                        and a[q - 1] == 58  # :
                    ):
                        continue
                    if q - 5 >= 0:  # lookbehind [^A-Za-z0-9_:]
                        b = int(a[q - 5])
                        if (
                            (65 <= b <= 90)
                            or (97 <= b <= 122)
                            or (48 <= b <= 57)
                            or b == 95
                            or b == 58
                        ):
                            continue
                    owl_start[j] = q - 4
                owl = owl_start >= 0
                keep = direct | iri | owl
                st = np.where(direct, ps - 4, np.where(iri, ps - L, owl_start))
                starts.append(st[keep])
                ends.append((u + 8)[keep])
                scores.append(np.full(int(keep.sum()), 0.98))
                ranks.append(rank[keep])

        if not starts:
            return None
        start = np.concatenate(starts)
        return {
            "start": start,
            "end": np.concatenate(ends),
            "prio": np.zeros(start.shape[0], dtype=np.int64),
            "score": np.concatenate(scores).astype(np.float64),
            "rank": np.concatenate(ranks),
        }

    # ------------------------------------------------------------ dict scan

    def _scan_dict(self, big, a, al, n, is_alpha, is_digit, upper):
        """Dictionary surfaces over [a-z0-9] token runs of the lowered bytes:
        length-bounded hash loop, searchsorted on token / token-pair hashes,
        then byte-exact per-surface verification and entry expansion."""
        if not self._surfaces and self._residual_re is None:
            return None
        tok = is_alpha | is_digit
        d = np.diff(tok.astype(np.int8))
        S = np.flatnonzero(d == 1) + 1
        E = np.flatnonzero(d == -1) + 1
        if tok[0]:
            S = np.concatenate([[0], S])
        if tok[-1]:
            E = np.concatenate([E, [n]])
        if S.size == 0:
            return None
        L = E - S
        # token hashes: h = h*B + byte over char positions within the token.
        # Only LUT-eligible tokens (length + first byte seen among surface
        # tokens) are hashed; they are processed sorted by length descending
        # so every loop iteration works on a contiguous prefix, in place.
        cap = self._max_tok
        H = np.zeros(S.shape[0], dtype=np.uint64)
        matchable = L <= cap
        key = L * 256 + al[S].astype(np.int64)
        matchable &= self._tok_lut[np.minimum(key, self._tok_lut.size - 1)]
        elig = np.flatnonzero(matchable)
        if elig.size:
            order = elig[np.argsort(-L[elig], kind="stable")]
            S2 = S[order].copy()
            L2 = L[order]
            cnt = np.bincount(L2, minlength=cap + 1)
            m_gt = S2.shape[0] - np.cumsum(cnt)  # tokens with length > k
            H2 = np.zeros(S2.shape[0], dtype=np.uint64)
            buf = np.empty(S2.shape[0], dtype=np.uint64)
            for k in range(cap):
                mk = int(m_gt[k]) if k < m_gt.shape[0] else 0
                if mk == 0:
                    break
                h = H2[:mk]
                np.multiply(h, _B, out=h)
                b = buf[:mk]
                b[:] = al[S2[:mk]]
                np.add(h, b, out=h)
                S2[:mk] += 1
            H[order] = H2

        cand_surf: list[np.ndarray] = []
        cand_s: list[np.ndarray] = []
        cand_e: list[np.ndarray] = []

        def probe(keys, surf_idx, h):
            pos = np.searchsorted(keys, h)
            pos_c = np.minimum(pos, keys.size - 1)
            hit = (pos < keys.size) & (keys[pos_c] == h)
            j = np.flatnonzero(hit)
            return surf_idx[pos_c[j]], j

        # chains of length 1..max_chain: iteratively extend (validity, fold
        # key) by one token; everything is contiguous slices of token arrays
        t1 = self._tables.get(1)
        if t1 is not None:
            m1 = np.flatnonzero(matchable)
            if m1.size:
                sfi, j = probe(t1[0], t1[1], H[m1])
                jj = m1[j]
                cand_surf.append(sfi)
                cand_s.append(S[jj])
                cand_e.append(E[jj])
        if self._max_chain >= 2 and S.size > 1:
            sep = al[E[:-1]].astype(np.uint64)
            adj = (S[1:] == E[:-1] + 1) & ((sep == 32) | (sep == 45))
            cur_val = matchable.copy()
            cur_h = H.copy()
            for ln in range(2, self._max_chain + 1):
                m = S.shape[0] - (ln - 1)
                if m <= 0:
                    break
                cur_val = (
                    cur_val[:m]
                    & adj[ln - 2 : ln - 2 + m]
                    & matchable[ln - 1 : ln - 1 + m]
                )
                if not cur_val.any():
                    break
                h2 = H[ln - 1 : ln - 1 + m]
                cur_h = (
                    (cur_h[:m] * _PAIR_K)
                    ^ (sep[ln - 2 : ln - 2 + m] * _B)
                    ^ ((h2 ^ (h2 >> np.uint64(29))) * _PAIR_K)
                )
                tl = self._tables.get(ln)
                if tl is None:
                    continue
                i = np.flatnonzero(cur_val)
                if i.size:
                    sfi, j = probe(tl[0], tl[1], cur_h[i])
                    ij = i[j]
                    cand_surf.append(sfi)
                    cand_s.append(S[ij])
                    cand_e.append(E[ij + (ln - 1)])

        if cand_surf:
            csurf = np.concatenate(cand_surf)
            cs = np.concatenate(cand_s)
            ce = np.concatenate(cand_e)
        else:
            csurf = np.empty(0, np.int64)
            cs = np.empty(0, np.int64)
            ce = np.empty(0, np.int64)

        if cs.size:
            # boundary classes: before not [A-Za-z0-9_], after not [A-Za-z0-9_-]
            hasb = cs > 0
            bchar = al[np.where(hasb, cs - 1, 0)]
            ok = ~(hasb & (bchar == 95))
            hase = ce < n
            echar = al[np.where(hase, ce, 0)]
            ok &= ~(hase & ((echar == 95) | (echar == 45)))
            csurf, cs, ce = csurf[ok], cs[ok], ce[ok]

        if cs.size:
            # byte-exact verification of ALL candidates in one padded-matrix
            # compare (hash only routes; a collision can never fabricate a
            # mention). r8: replaces the per-surface-group Python loop —
            # ~3.3k tiny-array iterations per chunk — with one gather +
            # compare over a (n_cand, max_surface_len) window; positions at
            # or beyond each candidate's length are masked true (measured
            # 16x on this step, bit-identical accept set).
            lens = ce - cs
            ok = lens == self._surf_len[csurf]
            if ok.any():
                lmax = self._surf_mat.shape[1]
                idx = np.minimum(cs[:, None] + np.arange(lmax), n - 1)
                cmp = al[idx] == self._surf_mat[csurf]
                pos_invalid = np.arange(lmax)[None, :] >= lens[:, None]
                ok &= (cmp | pos_invalid).all(axis=1)
            csurf, cs, ce = csurf[ok], cs[ok], ce[ok]

        starts: list[np.ndarray] = []
        ends: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        ranks: list[np.ndarray] = []
        if cs.size:
            # expand per dictionary entry; exact-case bonus: any uppercase in
            # the span, via a length-bounded gather loop (candidate-sized —
            # reduceat over scattered span pairs measured 6.6 s here)
            has_up = np.zeros(cs.shape[0], dtype=bool)
            span = ce - cs
            for k in range(int(span.max())):
                in_span = span > k
                ch = a[np.where(in_span, cs + k, 0)]
                has_up |= in_span & (ch >= 65) & (ch <= 90)
            n_upper = has_up.astype(np.int8)
            counts = self._ent_start[csurf + 1] - self._ent_start[csurf]
            rep = np.repeat(np.arange(cs.shape[0]), counts)
            ent = (
                np.repeat(self._ent_start[csurf], counts)
                + np.arange(rep.shape[0])
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
            es = cs[rep]
            ee = ce[rep]
            exact_l = self._ent_exact_lower[ent]
            base = self._ent_base[ent]
            score = np.where(exact_l & (n_upper[rep] == 0), base, base - 0.05)
            odd = np.flatnonzero(~exact_l)
            for j in odd:  # non-lowercase exact forms: per-candidate compare
                if big[es[j]:ee[j]] == self._ent_exact[ent[j]]:
                    score[j] = base[j]
            starts.append(es)
            ends.append(ee)
            scores.append(score)
            ranks.append(self._ent_rank[ent])

        if self._residual_re is not None:
            low = big.lower()
            rs, rend, rr, rsc = [], [], [], []
            if len(low) == len(big):
                for m in self._residual_re.finditer(low):
                    surf = m.group(0)
                    for tid, base, exact in self._surface_map.get(surf, ()):
                        rs.append(m.start())
                        rend.append(m.end())
                        rr.append(self._tid_rank[tid])
                        rsc.append(
                            base if big[m.start():m.end()] == exact else base - 0.05
                        )
            if rs:
                starts.append(np.asarray(rs, dtype=np.int64))
                ends.append(np.asarray(rend, dtype=np.int64))
                scores.append(np.asarray(rsc, dtype=np.float64))
                ranks.append(np.asarray(rr, dtype=np.int64))

        if not starts:
            return None
        start = np.concatenate(starts)
        return {
            "start": start,
            "end": np.concatenate(ends),
            "prio": np.ones(start.shape[0], dtype=np.int64),
            "score": np.concatenate(scores).astype(np.float64),
            "rank": np.concatenate(ranks),
        }

    # ------------------------------------------------------------- sweep

    def sweep(self, cand: dict, best_only: bool):
        """Leftmost-longest resolution over ALL rows at once: global lexsort
        by (start, -end, prio, -score, rank), then a greedy pass.

        r8: the greedy is run per CONFLICT GROUP instead of per candidate.
        A candidate whose start is >= the running max end of every earlier
        candidate can never be rejected (the greedy's last accepted end is
        bounded by that running max), and later decisions never look back
        past it — so boundaries of ``start >= cummax(end)`` split the
        sorted candidates into independent groups. Singleton groups (the
        vast majority: isolated mentions with one dictionary entry) are
        accepted wholesale with no Python; the per-candidate loop runs only
        inside multi-candidate groups. Output order/content is identical
        to the full greedy pass (pinned by the batched-vs-per-row property
        suite and the pure-Python oracle parity tests)."""
        start, end = cand["start"], cand["end"]
        if start.size == 0:
            return np.empty(0, np.int64)
        order = np.lexsort((cand["rank"], -cand["score"], cand["prio"], -end, start))
        ss = start[order]
        ee = end[order]
        n = ss.shape[0]
        new_group = np.empty(n, dtype=bool)
        new_group[0] = True
        np.greater_equal(ss[1:], np.maximum.accumulate(ee)[:-1], out=new_group[1:])
        gstart = np.flatnonzero(new_group)
        gsize = np.diff(np.concatenate([gstart, [n]]))
        if gsize.max() == 1:
            return order
        singleton = gsize == 1
        keep = np.zeros(n, dtype=bool)
        keep[gstart[singleton]] = True
        st = ss.tolist()
        en = ee.tolist()
        for g in np.flatnonzero(~singleton):
            i0 = int(gstart[g])
            i1 = i0 + int(gsize[g])
            last_end = -1
            cur_s = cur_e = -1
            for i in range(i0, i1):
                s = st[i]
                if s >= last_end:
                    cur_s, cur_e = s, en[i]
                    last_end = cur_e
                    keep[i] = True
                elif not best_only and s == cur_s and en[i] == cur_e:
                    keep[i] = True
        return order[np.flatnonzero(keep)]
