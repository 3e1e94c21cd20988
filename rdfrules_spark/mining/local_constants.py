"""Driver-local (DuckDB + numpy) fast path for constants mining/confidence.

At driver-sized inputs the staged distributed miners in
mining/constants.py + mining/measures_constants.py pay ~60 Spark stages of
fixed scheduling / shuffle-exchange latency on data that fits in driver
memory — measured 99.7 s for the task13 pipeline (19.7k triples,
951,333 rules) where the work itself is seconds of vectorized joins.
This module is the same adaptive-gate pattern as
canonicalize.connected_components: below ``RDFRULES_LOCAL_MINING_MAX``
triples (default 200k, env-overridable; ``local_threshold=0`` forces
distributed) the public entry points ``mine_constants`` /
``confidences_constants`` collect the triple set once and run the
IDENTICAL staged algebra — same survivor-set gating, same distinct-triple
/ injective laws, same PCA branch machinery — as DuckDB SQL over
integer-coded terms, with numpy for the per-rule law assembly and the
canonical-string emission. Above the gate the distributed path is
untouched — the 100 TB posture always takes the distributed loop.

Engine choice, measured: a pure pandas-merge transliteration of the same
algebra ran 245 s on the task13 input (single-threaded block copies at
the 45-90M-row join intermediates); DuckDB's parallel hash joins and
aggregates run it in seconds, and per-rule COUNTS are computed inside
DuckDB (``_binding_counts``) so only rule-table-sized arrays cross the
Arrow boundary. DuckDB here is driver-local compute like the numpy CC
gate — the correctness oracle for the registry remains the independent
DuckDB SQL written per query, and the hard parity anchors are the
executed-reference dumps, not any SQL engine.

Semantics are a 1:1 transliteration of the Spark expressions (reference
cites live in mining/constants.py and mining/measures_constants.py;
RuleRefinement.scala / RuleCounting.scala / AtomCounting.scala). Parity
is pinned three ways: the existing golden / brute / executed-reference
suites (tests/test_constants_mining.py, test_refexec_parity.py,
test_refexec_confidences.py, test_task13_parity.py) exercise THIS path at
their small inputs now that the gate is on; tests/test_local_constants.py
asserts local == distributed row-for-row at the gate boundary; and the
full task13 pipeline reproduces the executed reference's 951,333 rules.

Implementation notes:
  * all terms (s/p/o/constants) share one integer code space; string
    ORDER-dependent laws (canonical atom sort, q < r tie-breaks) go
    through a rank array built from one argsort of the term table —
    code-rank comparison == UTF-8 binary comparison (same as Spark);
  * triple identity = row index over the distinct triple set (the
    distributed path uses xxhash64 for shuffle-width reasons; only
    equality is ever tested, so any injective id is equivalent);
  * under Spark's ANSI mode a zero body/pca size would RAISE in the
    distributed plan's division; the local path emits null instead —
    the one documented divergence (only reachable on inputs where the
    distributed path would crash).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

_ENV_GATE = "RDFRULES_LOCAL_MINING_MAX"
_DEFAULT_GATE = 200_000


def local_threshold(explicit: int | None = None) -> int:
    """Resolve the gate: explicit param wins, else env, else default.
    0 disables the local path."""
    if explicit is not None:
        return explicit
    return int(os.environ.get(_ENV_GATE, _DEFAULT_GATE))


# --------------------------------------------------------------------------
# encoding helpers
# --------------------------------------------------------------------------


class _Enc:
    """Shared integer code space over the triple terms (+ any extra terms
    mapped later, e.g. rule constants absent from the KG)."""

    def __init__(self, tpdf: pd.DataFrame):
        s = tpdf["s"].to_numpy()
        p = tpdf["p"].to_numpy()
        o = tpdf["o"].to_numpy()
        codes, uniques = pd.factorize(
            np.concatenate([s, p, o]), use_na_sentinel=False
        )
        n = len(tpdf)
        self.terms = np.asarray(uniques, dtype=object)
        self.sc = codes[:n].astype(np.int64)
        self.pc = codes[n : 2 * n].astype(np.int64)
        self.oc = codes[2 * n :].astype(np.int64)
        self._rank = None
        self._index = None

    @property
    def n_terms(self) -> int:
        return len(self.terms)

    def rank(self) -> np.ndarray:
        """code -> lexicographic rank (rank compare == string compare)."""
        if self._rank is None:
            order = np.argsort(self.terms)
            r = np.empty(len(self.terms), dtype=np.int64)
            r[order] = np.arange(len(self.terms))
            self._rank = r
        return self._rank

    def map_terms(self, values: np.ndarray) -> np.ndarray:
        """Map arbitrary strings into the code space, EXTENDING it with
        fresh codes for unseen terms (so two different unseen constants
        never compare equal)."""
        if self._index is None:
            self._index = pd.Index(self.terms)
        codes = self._index.get_indexer(values)
        miss = codes < 0
        if miss.any():
            new_codes, new_terms = pd.factorize(
                values[miss], use_na_sentinel=False
            )
            codes = codes.astype(np.int64)
            codes[miss] = new_codes + len(self.terms)
            self.terms = np.concatenate(
                [self.terms, np.asarray(new_terms, dtype=object)]
            )
            self._index = None
            self._rank = None
        return codes.astype(np.int64)


def _group(*arrays: np.ndarray):
    """Compact group ids for the tuple of int columns.

    Returns (gid per row in 0..G-1, representative row index per gid).
    Hierarchical pack-and-factorize keeps every intermediate in int64."""
    key = pd.factorize(np.asarray(arrays[0], dtype=np.int64))[0].astype(
        np.int64
    )
    for c in arrays[1:]:
        # factorize each column first: compacts the range AND maps
        # negative sentinel values (e.g. the l2 combos' r = d2 = -1)
        # to valid codes, keeping the pack bijective
        cc = pd.factorize(np.asarray(c, dtype=np.int64))[0].astype(np.int64)
        m = int(cc.max()) + 1 if len(cc) else 1
        key = pd.factorize(key * m + cc)[0].astype(np.int64)
    if not len(key):
        return key, np.empty(0, dtype=np.int64)
    _, first = np.unique(key, return_index=True)
    return key, first


def _nunique(gid: np.ndarray, n_groups: int, sub: np.ndarray) -> np.ndarray:
    """countDistinct(sub) per group -> int64 array of length n_groups."""
    subc = pd.factorize(sub)[0].astype(np.int64)
    pack = int(subc.max()) + 1 if len(subc) else 1
    uk = np.unique(gid * pack + subc)
    return np.bincount(uk // pack, minlength=n_groups).astype(np.int64)


def _pair(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Pack an entity pair into one int64 (n = size of the code space)."""
    return a * np.int64(n) + b


def _cat(*parts) -> np.ndarray:
    """Vectorized string concat over object arrays / scalar strings."""
    n = next(len(p) for p in parts if isinstance(p, np.ndarray))
    out = np.full(n, "", dtype=object)
    for p in parts:
        out = out + p
    return out


def _vv_str(u: str, v: str, q: np.ndarray, d: np.ndarray, terms) -> np.ndarray:
    tq = terms[q]
    return np.where(
        d == 0, _cat(u + "|", tq, "|" + v), _cat(v + "|", tq, "|" + u)
    )


def _ca_str(u: str, q2: np.ndarray, cst: np.ndarray, e: np.ndarray,
            terms) -> np.ndarray:
    tq = terms[q2]
    tc = terms[cst]
    return np.where(
        e == 0,
        _cat(u + "|", tq, "|C=", tc),
        _cat("C=", tc, "|", tq, "|" + u),
    )


def _sorted_pair(a1: np.ndarray, a2: np.ndarray):
    """array_sort of a 2-atom array (lexicographic, like Spark)."""
    swap = a1 > a2
    lo = np.where(swap, a2, a1)
    hi = np.where(swap, a1, a2)
    return lo, hi


def _semi(left: pd.DataFrame, right: pd.DataFrame, on: list[str]):
    return left.merge(right[on].drop_duplicates(), on=on, how="inner")


def _anti(left: pd.DataFrame, right: pd.DataFrame, on: list[str]):
    m = left.merge(
        right[on].drop_duplicates(), on=on, how="left", indicator=True
    )
    return m[m["_merge"] == "left_only"].drop(columns="_merge")


def _gcount(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Row count per group (F.count) -> unique key rows + 'support'."""
    gid, first = _group(*[df[c].to_numpy() for c in cols])
    out = df.iloc[first][cols].reset_index(drop=True)
    out["support"] = np.bincount(gid, minlength=len(first)).astype(np.int64)
    return out


def _gcount_distinct(
    df: pd.DataFrame, cols: list[str], sub: np.ndarray
) -> pd.DataFrame:
    """countDistinct(sub) per group -> unique key rows + 'support'."""
    gid, first = _group(*[df[c].to_numpy() for c in cols])
    out = df.iloc[first][cols].reset_index(drop=True)
    out["support"] = _nunique(gid, len(first), sub)
    return out


def _b_local(enc: _Enc) -> pd.DataFrame:
    """Direction-tagged body relation (amie._b): d=0 'f', d=1 'i'."""
    n = len(enc.sc)
    tid = np.arange(n, dtype=np.int64)
    return pd.DataFrame(
        {
            "x": np.concatenate([enc.sc, enc.oc]),
            "y": np.concatenate([enc.oc, enc.sc]),
            "q": np.concatenate([enc.pc, enc.pc]),
            "d": np.concatenate(
                [np.zeros(n, np.int64), np.ones(n, np.int64)]
            ),
            "tid": np.concatenate([tid, tid]),
        }
    )


def _cpos_local(enc: _Enc) -> pd.DataFrame:
    """Per-predicate allowed constant position for 'lcs' (constants.py
    _const_side): cpos=1 ('o') when ns >= no else 0 ('s')."""
    df = pd.DataFrame({"p": enc.pc, "s": enc.sc, "o": enc.oc})
    g = df.groupby("p", sort=False).agg(
        ns=("s", "nunique"), no=("o", "nunique")
    )
    return pd.DataFrame(
        {
            "p": g.index.to_numpy(),
            "cpos": np.where(
                g["ns"].to_numpy() >= g["no"].to_numpy(), 1, 0
            ).astype(np.int64),
        }
    )


def _ca_local(
    enc: _Enc, constants: str, constants_for_predicates: dict | None
) -> pd.DataFrame:
    """Instantiated-atom relation CA(x, q2, cst, e, ctid); e=0 means the
    VARIABLE is at subject (constant at object). Transliterates
    constants.py _catoms including ConstantsForPredicates dispatch."""
    n = len(enc.sc)
    tid = np.arange(n, dtype=np.int64)
    sub = pd.DataFrame(
        {"x": enc.sc, "q2": enc.pc, "cst": enc.oc,
         "e": np.zeros(n, np.int64), "ctid": tid}
    )
    obj = pd.DataFrame(
        {"x": enc.oc, "q2": enc.pc, "cst": enc.sc,
         "e": np.ones(n, np.int64), "ctid": tid}
    )
    both = pd.concat([sub, obj], ignore_index=True)

    def by_policy(rel_sub, rel_obj, rel_both, policy):
        if policy == "object":
            return rel_sub
        if policy == "subject":
            return rel_obj
        if policy in ("both", "anywhere"):
            return rel_both
        if policy == "lcs":
            side = _cpos_local(enc).rename(columns={"p": "q2"})
            m = rel_both.merge(side, on="q2")
            m = m[((m["e"] == 0) & (m["cpos"] == 1))
                  | ((m["e"] == 1) & (m["cpos"] == 0))]
            return m.drop(columns="cpos")
        return rel_both.iloc[0:0]  # 'nowhere'

    if constants_for_predicates is None:
        return by_policy(sub, obj, both, constants).reset_index(drop=True)
    listed_codes = enc.map_terms(
        np.asarray(list(constants_for_predicates), dtype=object)
    )
    listed_mask_sub = np.isin(sub["q2"].to_numpy(), listed_codes)
    base = by_policy(
        sub[~listed_mask_sub],
        obj[~listed_mask_sub],
        both[~np.isin(both["q2"].to_numpy(), listed_codes)],
        constants,
    )
    cfp = pd.DataFrame(
        {
            "q2": listed_codes,
            "_pos": np.asarray(
                list(constants_for_predicates.values()), dtype=object
            ),
        }
    )
    lside = _cpos_local(enc).rename(columns={"p": "q2"})
    ov = both[np.isin(both["q2"].to_numpy(), listed_codes)].merge(
        cfp, on="q2"
    ).merge(lside, on="q2", how="left")
    keep = (
        (ov["_pos"] == "both")
        | ((ov["_pos"] == "object") & (ov["e"] == 0))
        | ((ov["_pos"] == "subject") & (ov["e"] == 1))
        | ((ov["_pos"] == "lcs") & (
            ((ov["e"] == 0) & (ov["cpos"] == 1))
            | ((ov["e"] == 1) & (ov["cpos"] == 0))
        ))
    )
    ov = ov[keep].drop(columns=["_pos", "cpos"])
    return pd.concat([base, ov], ignore_index=True)


# --------------------------------------------------------------------------
# mining (transliterates mining/constants.mine_constants)
# --------------------------------------------------------------------------


def _duck():
    """Fresh in-memory DuckDB connection using all cores (the local gate
    runs on the driver box; DuckDB's parallel hash joins/aggregates are
    what make driver-local execution faster than the staged Spark plan
    at these sizes)."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count() or 8}")
    return con


def mine_constants_local(
    tpdf: pd.DataFrame,
    params,
    constants: str = "anywhere",
    constants_for_predicates: dict | None = None,
    quasi_binding: bool = False,
) -> pd.DataFrame:
    """DuckDB/numpy replica of mine_constants: returns (head, p, atoms,
    shape, support, head_size, head_coverage) rows identical to the
    distributed miner (`tpdf` must be distinct (s,p,o) rows; callers
    dedupe). Each shape is ONE SQL statement mirroring the staged Spark
    aggregation (same survivor-set gating, same _ndt/_inj laws — see
    mining/constants.py for the reference cites)."""
    enc = _Enc(tpdf)
    N = enc.n_terms
    rank = enc.rank()
    inj = params.injective
    ndt = (not quasi_binding) or inj  # _ndt active
    cfp = constants_for_predicates

    n = len(tpdf)
    tid = np.arange(n, dtype=np.int64)
    htmask = (enc.sc != enc.oc) if inj else np.ones(n, dtype=bool)
    hs_by_code = np.zeros(N, dtype=np.int64)
    np.add.at(hs_by_code, enc.pc[htmask], 1)
    valid_head = hs_by_code >= params.min_head_size
    hs_by_code = np.where(valid_head, hs_by_code, -1)

    b = _b_local(enc)
    b["qr"] = rank[b["q"].to_numpy()]  # lexicographic rank for q < r laws
    ca = _ca_local(enc, constants, cfp)
    if quasi_binding and len(ca):
        # alone(CA) >= 2 — x is distinct per (q2,cst,e) by construction
        # (rows derive from distinct triples), so group size == nunique(x)
        gid, first = _group(ca["q2"].to_numpy(), ca["cst"].to_numpy(),
                            ca["e"].to_numpy())
        cnt = np.bincount(gid, minlength=len(first))
        ca_alone = ca[cnt[gid] >= 2].reset_index(drop=True)
    else:
        ca_alone = ca

    hm = htmask & valid_head[enc.pc]
    h0 = pd.DataFrame(
        {"p": enc.pc[hm], "a": enc.sc[hm], "bb": enc.oc[hm],
         "htid": tid[hm]}
    )
    heads = pd.DataFrame({
        "p": np.flatnonzero(valid_head).astype(np.int64),
        "head_size": hs_by_code[valid_head],
    })

    con = _duck()
    con.register("b", b)
    con.register("ca", ca)
    con.register("ca_alone", ca_alone)
    con.register("h0", h0)
    con.register("heads", heads)
    MS, MHC = params.min_support, params.min_head_coverage
    TH = f"sup >= {MS} AND sup >= head_size * {MHC}"

    out_parts: list[pd.DataFrame] = []

    def finish(agg: pd.DataFrame, shape: str, head_str, atoms,
               body_pred_cols: list[str]):
        """agg: group rows + 'support' (int64), 'p' = head predicate code.
        Applies the support/minHC thresholds and the duplicate-predicate
        filter (constants._finish), then builds the canonical strings."""
        if not len(agg):
            return
        agg = agg.reset_index(drop=True)
        agg["support"] = agg["support"].to_numpy().astype(np.int64)
        hs = hs_by_code[agg["p"].to_numpy()]
        keep = (
            (agg["support"].to_numpy() >= params.min_support)
            & (agg["support"].to_numpy() >= hs * params.min_head_coverage)
            & (hs > 0)
        )
        agg = agg[keep].reset_index(drop=True)
        hs = hs[keep]
        if not params.with_duplicate_predicates and len(agg):
            preds = [agg["p"].to_numpy()] + [
                agg[c].to_numpy() for c in body_pred_cols
            ]
            dup = np.zeros(len(agg), dtype=bool)
            for i in range(len(preds)):
                for j in range(i + 1, len(preds)):
                    dup |= preds[i] == preds[j]
            agg = agg[~dup].reset_index(drop=True)
            hs = hs[~dup]
        if not len(agg):
            return
        heads_s = head_str(agg)
        atom_arrays = atoms(agg)
        sup = agg["support"].to_numpy()
        out_parts.append(pd.DataFrame({
            "head": heads_s,
            "p": enc.terms[agg["p"].to_numpy()],
            "atoms": [list(t) for t in zip(*atom_arrays)]
            if len(atom_arrays) > 1
            else [[v] for v in atom_arrays[0]],
            "shape": shape,
            "support": sup,
            "head_size": hs,
            "head_coverage": sup / hs,
        }))

    def head0(df):
        return _cat("?a|", enc.terms[df["p"].to_numpy()], "|?b")

    # ---------------- H0 shapes ----------------
    ndt_m = "AND b.tid <> h0.htid" if ndt else ""
    con.execute(f"""
        CREATE TEMP TABLE m AS
        SELECT h0.p, h0.a, h0.bb, h0.htid, b.q, b.qr, b.d, b.tid
        FROM h0 JOIN b ON h0.a = b.x AND h0.bb = b.y
        WHERE (b.q <> h0.p OR b.d <> 0) {ndt_m}""")
    l2 = con.execute(
        "SELECT p, q, d, count(*) AS support FROM m GROUP BY ALL"
    ).df()
    finish(
        l2, "l2", head0,
        lambda df: [_vv_str("?a", "?b", df["q"].to_numpy(),
                            df["d"].to_numpy(), enc.terms)],
        ["q"],
    )

    if params.max_rule_length >= 3:
        # survivor gating via materialized key tables (GROUP BY keys are
        # unique, so the inner join IS a semi-join) — measurably faster
        # than EXISTS decorrelation at these sizes
        con.execute(f"""
            CREATE TEMP TABLE l2_keys AS
            SELECT l2.p, l2.q, l2.d FROM (
              SELECT p, q, d, count(*) AS sup FROM m GROUP BY ALL
            ) l2 JOIN heads USING (p) WHERE {TH}""")
        con.execute(
            "CREATE TEMP TABLE ms AS "
            "SELECT m.* FROM m JOIN l2_keys USING (p, q, d)")

        # l3v2: {VV, VV}
        ndt_p = "AND a1.tid <> a2.tid" if ndt else ""
        l3v2 = con.execute(f"""
            SELECT a1.p, a1.q, a1.d, a2.q AS r, a2.d AS d2,
                   count(*) AS support
            FROM ms a1 JOIN ms a2
              ON a1.p = a2.p AND a1.a = a2.a AND a1.bb = a2.bb
            WHERE (a1.qr < a2.qr OR (a1.q = a2.q AND a1.d < a2.d)) {ndt_p}
            GROUP BY ALL""").df()

        def atoms_l3v2(df):
            a1 = _vv_str("?a", "?b", df["q"].to_numpy(), df["d"].to_numpy(),
                         enc.terms)
            a2 = _vv_str("?a", "?b", df["r"].to_numpy(), df["d2"].to_numpy(),
                         enc.terms)
            return list(_sorted_pair(a1, a2))

        finish(l3v2, "l3v2", head0, atoms_l3v2, ["q", "r"])

        # l3 path (S3): gated by the dangling prefix survivors
        ndt_d = "AND b.tid <> h0.htid" if ndt else ""
        con.execute(f"""
            CREATE TEMP TABLE dang_a AS
            SELECT h0.p, h0.a, h0.bb, h0.htid, b.y AS c, b.q,
                   b.d AS d1, b.tid AS tid1
            FROM h0 JOIN b ON h0.a = b.x WHERE true {ndt_d}""")
        con.execute(f"""
            CREATE TEMP TABLE da_keys AS
            SELECT da.p, da.q, da.d1 FROM (
              SELECT p, q, d1, count(DISTINCT a * {N} + bb) AS sup
              FROM dang_a GROUP BY ALL
            ) da JOIN heads USING (p) WHERE {TH}""")
        con.execute(
            "CREATE TEMP TABLE dang_s AS SELECT dang_a.* FROM dang_a "
            "JOIN da_keys USING (p, q, d1)")
        ndt_j3 = "AND b2.tid <> j.htid AND j.tid1 <> b2.tid" if ndt else ""
        inj_j3 = "AND j.c <> j.a AND j.c <> j.bb" if inj else ""
        l3v3 = con.execute(f"""
            SELECT j.p, j.q, j.d1, b2.q AS r, b2.d AS d2,
                   count(DISTINCT j.a * {N} + j.bb) AS support
            FROM dang_s j JOIN b b2 ON j.bb = b2.x AND j.c = b2.y
            WHERE true {ndt_j3} {inj_j3}
            GROUP BY ALL""").df()

        def atoms_l3v3(df):
            a1 = _vv_str("?a", "?c", df["q"].to_numpy(), df["d1"].to_numpy(),
                         enc.terms)
            a2 = _vv_str("?b", "?c", df["r"].to_numpy(), df["d2"].to_numpy(),
                         enc.terms)
            return list(_sorted_pair(a1, a2))

        finish(l3v3, "l3v3", head0, atoms_l3v3, ["q", "r"])

        if constants != "nowhere" or cfp:
            # S4: {VV(a,b), CAtom on a or b}
            for role_var, key in (("?a", "a"), ("?b", "bb")):
                ndt_s4 = (
                    "AND ca.ctid <> ms.htid AND ca.ctid <> ms.tid"
                    if ndt else ""
                )
                qb_s4 = ""
                if quasi_binding:
                    # joint(CA | VV on the shared head var) >= 2, body-only
                    bvar = "x" if key == "a" else "y"
                    inj_ok = (
                        "AND b.x <> b.y AND b.tid <> ca.ctid"
                        if inj else ""
                    )
                    qb_s4 = f"""AND EXISTS (
                      SELECT 1 FROM (
                        SELECT b.q, b.d, ca.q2, ca.cst, ca.e
                        FROM b JOIN ca ON b.{bvar} = ca.x
                        WHERE true {inj_ok}
                        GROUP BY ALL HAVING count(DISTINCT ca.x) >= 2
                      ) ok
                      WHERE ok.q = ms.q AND ok.d = ms.d AND ok.q2 = ca.q2
                        AND ok.cst = ca.cst AND ok.e = ca.e
                    )"""
                agg = con.execute(f"""
                    SELECT ms.p, ms.q, ms.d, ca.q2, ca.cst, ca.e,
                           count(DISTINCT ms.a * {N} + ms.bb) AS support
                    FROM ms JOIN ca ON ms.{key} = ca.x
                    WHERE true {ndt_s4} {qb_s4}
                    GROUP BY ALL""").df()

                def atoms_s4(df, rv=role_var):
                    a1 = _vv_str("?a", "?b", df["q"].to_numpy(),
                                 df["d"].to_numpy(), enc.terms)
                    a2 = _ca_str(rv, df["q2"].to_numpy(),
                                 df["cst"].to_numpy(), df["e"].to_numpy(),
                                 enc.terms)
                    return list(_sorted_pair(a1, a2))

                finish(agg, "s4", head0, atoms_s4, ["q", "q2"])

            # S5: {CAtom(a), CAtom(b)} — gated by the instantiated-dangling
            # prefix survivors
            ndt_ia = "AND c1.ctid <> h0.htid" if ndt else ""
            con.execute(f"""
                CREATE TEMP TABLE ia AS
                SELECT h0.p, h0.a, h0.bb, h0.htid, c1.q2 AS qa,
                       c1.cst AS csta, c1.e AS ea, c1.ctid AS ctida
                FROM h0 JOIN ca_alone c1 ON h0.a = c1.x
                WHERE true {ndt_ia}""")
            ndt_s5 = (
                "AND c2.ctid <> ia.htid AND c2.ctid <> ia.ctida"
                if ndt else ""
            )
            inj_s5 = "AND ia.a <> ia.bb" if inj else ""
            con.execute(f"""
                CREATE TEMP TABLE ia_keys AS
                SELECT s.p, s.qa, s.csta, s.ea FROM (
                  SELECT p, qa, csta, ea,
                         count(DISTINCT a * {N} + bb) AS sup
                  FROM ia GROUP BY ALL
                ) s JOIN heads USING (p) WHERE {TH}""")
            con.execute(
                "CREATE TEMP TABLE ia_s AS SELECT ia.* FROM ia "
                "JOIN ia_keys USING (p, qa, csta, ea)")
            s5 = con.execute(f"""
                SELECT ia.p, ia.qa, ia.csta, ia.ea,
                       c2.q2, c2.cst, c2.e,
                       count(DISTINCT ia.a * {N} + ia.bb) AS support
                FROM ia_s ia JOIN ca_alone c2 ON ia.bb = c2.x
                WHERE true {ndt_s5} {inj_s5}
                GROUP BY ALL""").df()
            if quasi_binding and inj and len(s5):
                s5 = _anti(s5, _s5_kill(ca, rank),
                           ["qa", "csta", "ea", "q2", "cst", "e"])

            def atoms_s5(df):
                a1 = _ca_str("?a", df["qa"].to_numpy(), df["csta"].to_numpy(),
                             df["ea"].to_numpy(), enc.terms)
                a2 = _ca_str("?b", df["q2"].to_numpy(), df["cst"].to_numpy(),
                             df["e"].to_numpy(), enc.terms)
                return list(_sorted_pair(a1, a2))

            finish(s5, "s5", head0, atoms_s5, ["qa", "q2"])

    # ---------------- instantiated heads ----------------
    if constants != "nowhere" or cfp:
        for fixed_pos, fvar in (("s", "?b"), ("o", "?a")):
            if cfp is None:
                if constants == "object" and fixed_pos == "s":
                    continue
                if constants == "subject" and fixed_pos == "o":
                    continue
            ih = pd.DataFrame({
                "p": h0["p"].to_numpy(),
                "ha": (h0["a"] if fixed_pos == "s" else h0["bb"]).to_numpy(),
                "f": (h0["bb"] if fixed_pos == "s" else h0["a"]).to_numpy(),
                "htid": h0["htid"].to_numpy(),
            })
            ih = _ih_policy_filter(ih, enc, constants, cfp, fixed_pos)
            _mine_inst_shapes(
                con, ih, fixed_pos, fvar, enc, ca, params,
                quasi_binding, inj, ndt, TH, N, finish,
            )

    con.close()
    if not out_parts:
        return pd.DataFrame({
            "head": pd.Series([], dtype=object),
            "p": pd.Series([], dtype=object),
            "atoms": pd.Series([], dtype=object),
            "shape": pd.Series([], dtype=object),
            "support": pd.Series([], dtype=np.int64),
            "head_size": pd.Series([], dtype=np.int64),
            "head_coverage": pd.Series([], dtype=np.float64),
        })
    return pd.concat(out_parts, ignore_index=True)


def _s5_kill(ca: pd.DataFrame, rank: np.ndarray) -> pd.DataFrame:
    """Injective quasi-binding kill set for {CAa, CAb} (constants.py
    s5 branch): atom pairs whose entity sets are exactly {cstA, cstB}
    cross-oriented on one predicate."""
    g = ca.groupby(["q2", "cst", "e"], sort=False)["x"]
    cc = g.agg(["nunique"]).reset_index()
    two = cc[cc["nunique"] == 2][["q2", "cst", "e"]]
    if not len(two):
        return pd.DataFrame(
            columns=["qa", "csta", "ea", "q2", "cst", "e"]
        )
    # the two distinct xs per such group, by rank order
    mem = two.merge(ca[["q2", "cst", "e", "x"]].drop_duplicates(),
                    on=["q2", "cst", "e"])
    mem["_xr"] = rank[mem["x"].to_numpy()]
    gm = mem.groupby(["q2", "cst", "e"], sort=False).agg(
        xlo=("_xr", "min"), xhi=("_xr", "max")
    ).reset_index()
    k1 = gm.rename(columns={"q2": "qa", "cst": "csta", "e": "ea",
                            "xlo": "xlo1", "xhi": "xhi1"})
    k2 = gm.rename(columns={"xlo": "xlo2", "xhi": "xhi2"})
    pairsk = k1.merge(k2, left_on="qa", right_on="q2")
    pairsk = pairsk[
        (pairsk["ea"] != pairsk["e"]) & (pairsk["csta"] != pairsk["cst"])
    ]
    cr1 = rank[pairsk["csta"].to_numpy()]
    cr2 = rank[pairsk["cst"].to_numpy()]
    clo = np.minimum(cr1, cr2)
    chi = np.maximum(cr1, cr2)
    good = (
        (pairsk["xlo1"].to_numpy() == clo)
        & (pairsk["xhi1"].to_numpy() == chi)
        & (pairsk["xlo2"].to_numpy() == clo)
        & (pairsk["xhi2"].to_numpy() == chi)
    )
    return pairsk[good][["qa", "csta", "ea", "q2", "cst", "e"]]


def _ih_policy_filter(ih, enc, constants, cfp, fixed_pos):
    """Head-constant position dispatch for instantiated heads
    (constants.py mine_constants, the cfp/lcs ih filters)."""
    if cfp is not None:
        listed_all = enc.map_terms(np.asarray(list(cfp), dtype=object))
        listed_ok = enc.map_terms(np.asarray(
            [p for p, pos in cfp.items()
             if pos == "both"
             or (pos == "subject" and fixed_pos == "s")
             or (pos == "object" and fixed_pos == "o")
             or pos == "lcs"], dtype=object))
        lcs_listed = enc.map_terms(np.asarray(
            [p for p, pos in cfp.items() if pos == "lcs"], dtype=object))
        g_ok = (
            constants in ("anywhere", "lcs")
            or (constants == "subject" and fixed_pos == "s")
            or (constants == "object" and fixed_pos == "o")
        )
        pcol = ih["p"].to_numpy()
        cond = np.isin(pcol, listed_ok)
        if g_ok:
            cond = cond | ~np.isin(pcol, listed_all)
        ih = ih[cond].reset_index(drop=True)
        if len(lcs_listed) or constants == "lcs":
            side = _cpos_local(enc)
            ih = ih.merge(side, on="p", how="left")
            pcol = ih["p"].to_numpy()
            lcs_governed = np.isin(pcol, lcs_listed) | (
                (constants == "lcs") & ~np.isin(pcol, listed_all)
            )
            fp = 1 if fixed_pos == "o" else 0
            keep = ~lcs_governed | (ih["cpos"].to_numpy() == fp)
            ih = ih[keep].drop(columns="cpos").reset_index(drop=True)
    elif constants == "lcs":
        side = _cpos_local(enc)
        fp = 1 if fixed_pos == "o" else 0
        ih = ih.merge(side, on="p")
        ih = ih[ih["cpos"].to_numpy() == fp].drop(
            columns="cpos"
        ).reset_index(drop=True)
    return ih


def _mine_inst_shapes(con, ih, fixed_pos, fvar, enc, ca, params,
                      quasi_binding, inj, ndt, TH, N, finish):
    """S6/S7/S8/S9 for one head-constant side (constants.py
    mine_constants instantiated-head block), DuckDB core."""
    terms = enc.terms
    con.register("ih", ih)

    def head_i(df):
        tp = terms[df["p"].to_numpy()]
        ta = terms[df["ha"].to_numpy()]
        if fixed_pos == "s":
            return _cat("C=", ta, "|", tp, "|?b")
        return _cat("?a|", tp, "|C=", ta)

    opp_e = 1 if fixed_pos == "s" else 0  # 'o' if head const at ?b side

    # S6: one CAtom on the free var (gate for S9). Group size == distinct
    # f (one row per (head triple, atom) — both sides derive from
    # distinct triples)
    ndt_ca = "AND ca.ctid <> ih.htid" if ndt else ""
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE ihca AS
        SELECT ih.p, ih.ha, ih.f, ih.htid,
               ca.q2, ca.cst, ca.e, ca.ctid
        FROM ih JOIN ca_alone ca ON ih.f = ca.x
        WHERE NOT (ca.e = {opp_e} AND ca.q2 = ih.p AND ca.cst = ih.ha)
          {ndt_ca}""")
    s6 = con.execute("""
        SELECT p, ha, q2, cst, e, count(*) AS support
        FROM ihca GROUP BY ALL""").df()

    def atoms_s6(df):
        return [_ca_str(fvar, df["q2"].to_numpy(), df["cst"].to_numpy(),
                        df["e"].to_numpy(), terms)]

    finish(s6, "s6", head_i, atoms_s6, ["q2"])

    if params.max_rule_length < 3:
        con.unregister("ih")
        return
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE s6s AS
        SELECT s.p, s.ha, s.q2, s.cst, s.e FROM (
          SELECT p, ha, q2, cst, e, count(*) AS sup
          FROM ihca GROUP BY ALL
        ) s JOIN heads USING (p) WHERE {TH}""")

    # dangling prefix (head) <- VV(f, c) — gate for S7/S8
    ndt_b = "AND b.tid <> ih.htid" if ndt else ""
    inj_b = "AND b.y <> ih.f" if inj else ""
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE ihb AS
        SELECT ih.p, ih.ha, ih.f, b.y AS c, b.q, b.qr, b.d, b.tid,
               ih.htid
        FROM ih JOIN b ON ih.f = b.x
        WHERE true {ndt_b} {inj_b}""")
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE d7_keys AS
        SELECT s.p, s.ha, s.q, s.d FROM (
          SELECT p, ha, q, d, count(DISTINCT f) AS sup
          FROM ihb GROUP BY ALL
        ) s JOIN heads USING (p) WHERE {TH}""")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE ihb_s AS SELECT ihb.* FROM ihb "
        "JOIN d7_keys USING (p, ha, q, d)")

    # S7: {VV(f,c), VV(f,c)} distinct pair
    ndt_p7 = "AND a1.tid <> a2.tid" if ndt else ""
    s7 = con.execute(f"""
        SELECT a1.p, a1.ha, a1.q, a1.d, a2.q AS r, a2.d AS d2,
               count(DISTINCT a1.f) AS support
        FROM ihb_s a1 JOIN ihb a2
          ON a1.p = a2.p AND a1.ha = a2.ha AND a1.f = a2.f
          AND a1.c = a2.c
        WHERE (a1.qr < a2.qr OR (a1.q = a2.q AND a1.d < a2.d)) {ndt_p7}
        GROUP BY ALL""").df()

    def atoms_s7(df):
        a1 = _vv_str(fvar, "?c", df["q"].to_numpy(), df["d"].to_numpy(),
                     terms)
        a2 = _vv_str(fvar, "?c", df["r"].to_numpy(), df["d2"].to_numpy(),
                     terms)
        return list(_sorted_pair(a1, a2))

    finish(s7, "s7", head_i, atoms_s7, ["q", "r"])

    # S8: {VV(f,c), CAtom(c)}
    ndt_s8 = (
        "AND ca.ctid <> ihb_s.htid AND ca.ctid <> ihb_s.tid" if ndt else ""
    )
    qb_s8 = ""
    if quasi_binding:
        inj_ok = "AND b.x <> b.y AND b.tid <> ca.ctid" if inj else ""
        qb_s8 = f"""AND EXISTS (
          SELECT 1 FROM (
            SELECT b.q, b.d, ca.q2, ca.cst, ca.e
            FROM b JOIN ca ON b.y = ca.x
            WHERE true {inj_ok}
            GROUP BY ALL HAVING count(DISTINCT b.y) >= 2
          ) ok
          WHERE ok.q = ihb_s.q AND ok.d = ihb_s.d AND ok.q2 = ca.q2
            AND ok.cst = ca.cst AND ok.e = ca.e
        )"""
    s8 = con.execute(f"""
        SELECT ihb_s.p, ihb_s.ha, ihb_s.q, ihb_s.d,
               ca.q2, ca.cst, ca.e, count(DISTINCT ihb_s.f) AS support
        FROM ihb_s JOIN ca ON ihb_s.c = ca.x
        WHERE true {ndt_s8} {qb_s8}
        GROUP BY ALL""").df()

    def atoms_s8(df):
        a1 = _vv_str(fvar, "?c", df["q"].to_numpy(), df["d"].to_numpy(),
                     terms)
        a2 = _ca_str("?c", df["q2"].to_numpy(), df["cst"].to_numpy(),
                     df["e"].to_numpy(), terms)
        return list(_sorted_pair(a1, a2))

    finish(s8, "s8", head_i, atoms_s8, ["q", "q2"])

    # S9: {CAtom(f), CAtom(f)} distinct pair, gated by S6 survivors on
    # the canonically-smaller atom. Atom identity = canonical string;
    # compare via a rank over the distinct CA atoms present.
    dca = con.execute("SELECT DISTINCT q2, cst, e FROM ihca").df()
    if not len(dca):
        con.unregister("ih")
        return
    astr = _ca_str(fvar, dca["q2"].to_numpy(), dca["cst"].to_numpy(),
                   dca["e"].to_numpy(), terms)
    aord = np.argsort(astr)
    arank = np.empty(len(astr), dtype=np.int64)
    arank[aord] = np.arange(len(astr))
    dca = dca.assign(ak=arank)
    con.register("akt", dca)
    ndt_s9 = "AND a1.ctid <> a2.ctid" if ndt else ""
    qb_j = ""
    if quasi_binding:
        # joint(CA1 x CA2 on the shared var) >= 2 over the KG, body-only
        qb_j = """AND EXISTS (
          SELECT 1 FROM (
            SELECT k1.ak AS ak1, k2.ak AS ak2
            FROM (SELECT ca.x, akt.ak FROM ca JOIN akt USING (q2, cst, e))
                 k1
            JOIN (SELECT ca.x, akt.ak FROM ca JOIN akt USING (q2, cst, e))
                 k2 ON k1.x = k2.x
            WHERE k1.ak < k2.ak
            GROUP BY ALL HAVING count(DISTINCT k1.x) >= 2
          ) ok WHERE ok.ak1 = a1.ak AND ok.ak2 = a2.ak
        )"""
    s9 = con.execute(f"""
        WITH ihk AS (
          SELECT ihca.*, akt.ak FROM ihca JOIN akt USING (q2, cst, e)
        ), r1 AS (
          SELECT ihk.* FROM ihk JOIN s6s USING (p, ha, q2, cst, e)
        )
        SELECT a1.p, a1.ha, a1.ak AS ak1, a2.ak AS ak2,
               a2.q2 AS q2b, a2.cst AS cstb, a2.e AS eb,
               count(*) AS support
        FROM r1 a1 JOIN ihk a2
          ON a1.p = a2.p AND a1.ha = a2.ha AND a1.f = a2.f
        WHERE a1.ak < a2.ak {ndt_s9} {qb_j}
        GROUP BY ALL""").df()
    ak_to_q2 = np.empty(len(dca), dtype=np.int64)
    ak_to_q2[dca["ak"].to_numpy()] = dca["q2"].to_numpy()
    if len(s9):
        s9["q2a"] = ak_to_q2[s9["ak1"].to_numpy()]
    else:
        s9["q2a"] = pd.Series([], dtype=np.int64)
    astr_by_rank = np.empty(len(astr), dtype=object)
    astr_by_rank[arank] = astr

    def atoms_s9(df):
        return [astr_by_rank[df["ak1"].to_numpy()],
                astr_by_rank[df["ak2"].to_numpy()]]

    finish(s9, "s9", head_i, atoms_s9, ["q2a", "q2b"])
    con.unregister("akt")
    con.unregister("ih")


# --------------------------------------------------------------------------
# confidences (transliterates measures_constants.confidences_constants)
# --------------------------------------------------------------------------


class _UA(dict):
    """Unique-atom table stored in DataFrame.attrs — pandas deep-copies
    attrs on most frame operations, so make deepcopy the identity (the
    table is immutable by convention)."""

    def __deepcopy__(self, memo):
        return self


def _parse_rules(rules_pdf: pd.DataFrame, enc: _Enc) -> pd.DataFrame:
    """Parse rule rows into integer-coded per-rule columns. Parsing runs
    on the DISTINCT head / atom strings only (heavily shared across
    rules), then maps back through codes."""
    n = len(rules_pdf)
    R = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "shape": rules_pdf["shape"].to_numpy(),
        "support": rules_pdf["support"].to_numpy().astype(np.int64),
        "head_size": rules_pdf["head_size"].to_numpy().astype(np.int64),
        "head_coverage": rules_pdf["head_coverage"].to_numpy(),
    })
    R["p"] = enc.map_terms(rules_pdf["p"].to_numpy())

    # heads --------------------------------------------------------------
    hcodes, hstrs = pd.factorize(rules_pdf["head"].to_numpy(),
                                 use_na_sentinel=False)
    hparts = [h.split("|") for h in hstrs]
    h_s = np.asarray([p[0] for p in hparts], dtype=object)
    h_o = np.asarray([p[2] for p in hparts], dtype=object)
    # fvpos: the free variable's position for instantiated heads
    # (_head_var_pos): 0 when head subject is a variable
    fv = np.where(np.char.startswith(h_s.astype(str), "?"), 0, 1)
    # head constant (instantiated heads only; "?" heads get a fresh code
    # that never matches data)
    hconst = np.where(fv == 0, h_o, h_s)
    hconst = np.asarray(
        [c[2:] if c.startswith("C=") else "\x00?" for c in hconst],
        dtype=object,
    )
    hc_codes = enc.map_terms(hconst)
    R["fvpos"] = fv[hcodes]
    R["hA"] = hc_codes[hcodes]

    # atoms --------------------------------------------------------------
    atoms = rules_pdf["atoms"].to_numpy()
    n_at = np.asarray([len(a) for a in atoms], dtype=np.int64)
    flat = np.asarray(
        [a for row in atoms for a in row], dtype=object
    )
    arow = np.repeat(np.arange(n, dtype=np.int64), n_at)
    offs = np.concatenate([[0], np.cumsum(n_at)[:-1]]) if n else n_at
    apos = (
        np.arange(int(n_at.sum()), dtype=np.int64)
        - np.repeat(offs, n_at)
    ) if n else np.empty(0, np.int64)
    acodes, astrs = pd.factorize(flat, use_na_sentinel=False)
    pa = [a.split("|") for a in astrs]
    a_s = np.asarray([p[0] for p in pa], dtype=object)
    a_q = np.asarray([p[1] for p in pa], dtype=object)
    a_o = np.asarray([p[2] for p in pa], dtype=object)
    is_ca = np.asarray(
        [s.startswith("C=") or o.startswith("C=") for s, o in zip(a_s, a_o)]
    )
    q_codes = enc.map_terms(a_q)
    var_at_s = np.asarray([s.startswith("?") for s in a_s])
    cst = np.where(var_at_s, a_o, a_s)
    cst = np.asarray(
        [c[2:] if c.startswith("C=") else "\x00?" for c in cst],
        dtype=object,
    )
    cst_codes = enc.map_terms(cst)
    uvar = np.where(var_at_s, a_s, a_o)  # CA: the variable name
    # per-atom integer fields, indexed by unique-atom id
    ua = {
        "is_ca": is_ca, "q": q_codes, "cst": cst_codes,
        "e": np.where(var_at_s, 0, 1).astype(np.int64),
        "uvar": uvar, "s_var": a_s, "o_var": a_o,
    }
    # expand to per-rule atom slots (atom0 / atom1), preserving BOTH the
    # array order and the inst/vv sub-orders the Spark parser uses
    slot = np.full((n, 2), -1, dtype=np.int64)
    if len(arow):
        slot[arow, apos] = acodes
    R["_at0"] = slot[:, 0]
    R["_at1"] = slot[:, 1]
    # _inst / _vv ordered filters (F.filter keeps array order)
    at0_ca = np.where(slot[:, 0] >= 0, is_ca[slot[:, 0]], False)
    at1_ca = np.where(slot[:, 1] >= 0, is_ca[slot[:, 1]], False)
    R["_inst0"] = np.where(at0_ca, slot[:, 0],
                           np.where(at1_ca, slot[:, 1], -1))
    R["_inst1"] = np.where(at0_ca & at1_ca, slot[:, 1], -1)
    R["_vv0"] = np.where(~at0_ca & (slot[:, 0] >= 0), slot[:, 0],
                         np.where(~at1_ca & (slot[:, 1] >= 0),
                                  slot[:, 1], -1))
    R["_vv1"] = np.where(
        ~at0_ca & (slot[:, 0] >= 0) & ~at1_ca & (slot[:, 1] >= 0),
        slot[:, 1], -1,
    )
    R.attrs["ua"] = _UA(ua)
    return R


def _ca_fields(R: pd.DataFrame, col: str, prefix: str) -> pd.DataFrame:
    """_ca_cols: (prefix+u [0='?a',1='?b',2='?c'], q2, cst, e) from the
    unique-atom table for the atom id in R[col]."""
    ua = R.attrs["ua"]
    ids = R[col].to_numpy()
    safe = np.maximum(ids, 0)
    uv = ua["uvar"][safe]
    out = pd.DataFrame({
        prefix + "u": np.select(
            [uv == "?a", uv == "?b"], [0, 1], 2
        ).astype(np.int64),
        prefix + "q2": ua["q"][safe],
        prefix + "cst": ua["cst"][safe],
        prefix + "e": ua["e"][safe],
    }, index=R.index)
    return out


def _vv_fields(R: pd.DataFrame, col: str, primary, prefix: str):
    """_vv_cols: (prefix+q, prefix+d) with d=0 ('f') when the primary var
    is at subject. `primary` is a string or per-rule object array."""
    ua = R.attrs["ua"]
    ids = R[col].to_numpy()
    safe = np.maximum(ids, 0)
    sv = ua["s_var"][safe]
    if isinstance(primary, str):
        d = np.where(sv == primary, 0, 1)
    else:
        d = np.where(sv == primary, 0, 1)
    return pd.DataFrame({
        prefix + "q": ua["q"][safe],
        prefix + "d": d.astype(np.int64),
    }, index=R.index)


class _Rel:
    """Shared confidence-side relations over the coded triple set
    (measures_constants helpers _ents/_side/_side_ents/_b_rel/_psize/
    _casize, plus packed-key membership tests)."""

    def __init__(self, enc: _Enc, injective: bool):
        self.enc = enc
        n = len(enc.sc)
        self.N = enc.n_terms  # NOTE: may grow via map_terms; pack later
        self.E = pd.DataFrame({
            "q2": np.concatenate([enc.pc, enc.pc]),
            "cst": np.concatenate([enc.oc, enc.sc]),
            "e": np.concatenate([np.zeros(n, np.int64),
                                 np.ones(n, np.int64)]),
            "x": np.concatenate([enc.sc, enc.oc]),
        })
        se = pd.DataFrame({
            "p": np.concatenate([enc.pc, enc.pc]),
            "pos": np.concatenate([np.zeros(n, np.int64),
                                   np.ones(n, np.int64)]),
            "x": np.concatenate([enc.sc, enc.oc]),
        }).drop_duplicates()
        self.SE = se.reset_index(drop=True)
        g = pd.DataFrame({"p": enc.pc, "s": enc.sc, "o": enc.oc}).groupby(
            "p", sort=False
        ).agg(ns=("s", "nunique"), no=("o", "nunique"))
        self.hside_by_code = np.full(self.N, -1, dtype=np.int64)
        self.hside_by_code[g.index.to_numpy()] = np.where(
            g["ns"].to_numpy() >= g["no"].to_numpy(), 0, 1
        )
        self.b = _b_local(enc).drop(columns="tid")
        # psize: scoreAtom for 2-var atoms (non-reflexive under injective)
        mask = (enc.sc != enc.oc) if injective else np.ones(n, dtype=bool)
        self.psz_by_code = np.zeros(self.N, dtype=np.int64)
        np.add.at(self.psz_by_code, enc.pc[mask], 1)
        # plain predicate sizes (body_sizes l2 uses the same mask)
        self._se_keys = None
        self._ne = None

    def se_member(self, p, pos, x) -> np.ndarray:
        """Membership in SE(p, pos, x) — vectorized."""
        if self._se_keys is None:
            k = (self.SE["p"].to_numpy() * 2 + self.SE["pos"].to_numpy()
                 ) * np.int64(self.N) + self.SE["x"].to_numpy()
            self._se_keys = np.sort(k)
        q = (np.asarray(p) * 2 + np.asarray(pos)) * np.int64(self.N) + \
            np.asarray(x)
        idx = np.searchsorted(self._se_keys, q)
        idx = np.minimum(idx, len(self._se_keys) - 1)
        if not len(self._se_keys):
            return np.zeros(len(q), dtype=bool)
        return self._se_keys[idx] == q

    def nent(self, p, pos) -> np.ndarray:
        """#entities of p at position pos (NE)."""
        if self._ne is None:
            self._ne = np.bincount(
                self.SE["p"].to_numpy() * 2 + self.SE["pos"].to_numpy(),
                minlength=2 * self.N,
            ).astype(np.int64)
        return self._ne[np.asarray(p) * 2 + np.asarray(pos)]

    def casize(self, df, qc, cc, ec) -> np.ndarray:
        """_casize: instantiated-atom slice size, non-reflexive
        (entities x != cst)."""
        E = self.E
        nr = E[E["x"].to_numpy() != E["cst"].to_numpy()]
        key = (nr["q2"].to_numpy() * np.int64(self.N) + nr["cst"].to_numpy()
               ) * 2 + nr["e"].to_numpy()
        uk, cnt = np.unique(key, return_counts=True)
        q = (df[qc].to_numpy() * np.int64(self.N) + df[cc].to_numpy()
             ) * 2 + df[ec].to_numpy()
        idx = np.searchsorted(uk, q)
        out = np.zeros(len(q), dtype=np.int64)
        if len(uk):
            idx = np.minimum(idx, len(uk) - 1)
            hit = uk[idx] == q
            out[hit] = cnt[idx[hit]]
        return out


def _varonly_sizes(R: pd.DataFrame, rel: _Rel, injective: bool):
    """body_size / pca_body_size for l2 / l3v2 / l3v3 rules — the
    measures.confidences combo-level laws, vectorized. Returns a frame
    (rid, body_size, pca_body_size) with NaN for missing sizes."""
    ua = R.attrs["ua"]
    vv = R[R["shape"].isin(["l2", "l3v2", "l3v3"])]
    if not len(vv):
        return pd.DataFrame(columns=["rid", "body_size", "pca_body_size"])
    sh = vv["shape"].to_numpy()
    v0 = vv["_vv0"].to_numpy()
    v1 = vv["_vv1"].to_numpy()
    s0 = ua["s_var"][np.maximum(v0, 0)]
    s1 = ua["s_var"][np.maximum(v1, 0)]
    o0 = ua["o_var"][np.maximum(v0, 0)]
    # l3v3: a_atom = the atom containing ?a, b_atom the one with ?b
    a_is_v0 = (s0 == "?a") | (o0 == "?a")
    av = np.where((sh == "l3v3") & ~a_is_v0, v1, v0)
    # second atom: l3v2's r/d2 always come from _vv1; l3v3's b_atom is
    # whichever atom does NOT hold ?a
    bv = np.where(sh == "l3v3", np.where(a_is_v0, v1, v0), v1)
    q = ua["q"][np.maximum(av, 0)]
    d1 = np.where(
        sh == "l3v3",
        np.where(ua["s_var"][np.maximum(av, 0)] == "?a", 0, 1),
        np.where(s0 == "?a", 0, 1),
    ).astype(np.int64)
    r = np.where(sh == "l2", -1, ua["q"][np.maximum(bv, 0)])
    d2 = np.select(
        [sh == "l3v3", sh == "l3v2"],
        [np.where(ua["s_var"][np.maximum(bv, 0)] == "?b", 0, 1),
         np.where(s1 == "?a", 0, 1)],
        -1,
    ).astype(np.int64)
    comp = pd.DataFrame({
        "rid": vv["rid"].to_numpy(), "p": vv["p"].to_numpy(),
        "shape": sh, "q": q, "d1": d1, "r": r, "d2": d2,
    })
    N = rel.N
    b = rel.b
    outs = []
    for shape in ("l2", "l3v2", "l3v3"):
        cs = comp[comp["shape"] == shape]
        if not len(cs):
            continue
        combos = cs[["q", "d1", "r", "d2"]].drop_duplicates()
        if shape == "l2":
            qs = combos["q"].drop_duplicates().to_numpy()
            bs = pd.DataFrame({
                "q": qs, "body_size": rel.psz_by_code[qs],
            })
            sized = cs.merge(bs, on="q", how="left")
            pr = b.rename(columns={"d": "d1", "x": "a", "y": "bb"}).merge(
                combos[["q", "d1"]].drop_duplicates(), on=["q", "d1"]
            )
            if injective:
                pr = pr[pr["a"] != pr["bb"]]
            pr = pr.reset_index(drop=True)
        elif shape == "l3v2":
            b1 = b.rename(columns={"x": "a", "y": "bb", "d": "d1"}).merge(
                combos[["q", "d1"]].drop_duplicates(), on=["q", "d1"]
            )
            b2 = b.rename(columns={"x": "a", "y": "bb", "q": "r",
                                   "d": "d2"}).merge(
                combos[["r", "d2"]].drop_duplicates(), on=["r", "d2"]
            )
            j = b1.merge(b2, on=["a", "bb"])
            j = _semi(j, combos, ["q", "d1", "r", "d2"])
            if injective:
                j = j[j["a"] != j["bb"]]
            pr = j.drop_duplicates(
                subset=["q", "d1", "r", "d2", "a", "bb"]
            ).reset_index(drop=True)
            sized = cs.merge(
                _gcount(pr, ["q", "d1", "r", "d2"]).rename(
                    columns={"support": "body_size"}
                ), on=["q", "d1", "r", "d2"], how="left",
            )
        else:  # l3v3
            b1 = b.rename(columns={"x": "a", "y": "c", "d": "d1"}).merge(
                combos[["q", "d1"]].drop_duplicates(), on=["q", "d1"]
            )
            b2 = b.rename(columns={"x": "bb", "y": "c", "q": "r",
                                   "d": "d2"}).merge(
                combos[["r", "d2"]].drop_duplicates(), on=["r", "d2"]
            )
            j = b1.merge(b2, on="c")
            j = _semi(j, combos, ["q", "d1", "r", "d2"])
            if injective:
                j = j[(j["a"] != j["bb"]) & (j["c"] != j["a"])
                      & (j["c"] != j["bb"])]
            pr = j.drop_duplicates(
                subset=["q", "d1", "r", "d2", "a", "bb"]
            ).reset_index(drop=True)
            sized = cs.merge(
                _gcount_distinct(
                    j.reset_index(drop=True), ["q", "d1", "r", "d2"],
                    _pair(j["a"].to_numpy(), j["bb"].to_numpy(), N),
                ).rename(columns={"support": "body_size"}),
                on=["q", "d1", "r", "d2"], how="left",
            )
        # pca: expand distinct pairs to the combo's head predicates and
        # keep pairs whose head entity on hside exists for p
        ph = cs[["p", "q", "d1", "r", "d2"]].drop_duplicates()
        ph = ph.assign(hside=rel.hside_by_code[ph["p"].to_numpy()])
        ex = pr.merge(ph, on=[c for c in ("q", "d1", "r", "d2")
                              if c in pr.columns])
        hv = np.where(ex["hside"].to_numpy() == 0, ex["a"].to_numpy(),
                      ex["bb"].to_numpy())
        keep = rel.se_member(ex["p"].to_numpy(), ex["hside"].to_numpy(), hv)
        ex = ex[keep].reset_index(drop=True)
        ps = _gcount(ex, ["p", "q", "d1", "r", "d2"]).rename(
            columns={"support": "pca_body_size"}
        )
        sized = sized.merge(ps, on=["p", "q", "d1", "r", "d2"], how="left")
        outs.append(sized[["rid", "body_size", "pca_body_size"]])
    return pd.concat(outs, ignore_index=True)


def _binding_counts(con, src_sql: str, n_rules: int,
                    restricted: bool) -> np.ndarray:
    """Per-rule counts of a DISTINCT (rid, v) binding source, computed
    INSIDE DuckDB (shipping the binding sets to Python measured 13 s of
    the task13 confidence pass; the counts are rule-table sized).
    ``restricted``: the PCA restriction — v must be an entity of the
    head predicate at its higherCardinalitySide, applied only to rules
    with hside == fvpos (the others reuse body_size)."""
    if not restricted:
        q = f"SELECT rid, count(*) AS c FROM ({src_sql}) GROUP BY rid"
    else:
        q = f"""
            SELECT b.rid, count(*) AS c FROM ({src_sql}) b
            JOIN meta ON meta.rid = b.rid
            JOIN SE ON SE.p = meta.p AND SE.pos = meta.hside
                   AND SE.x = b.v
            WHERE meta.hside = meta.fvpos
            GROUP BY b.rid"""
    d = con.execute(q).fetchnumpy()
    out = np.zeros(n_rules, dtype=np.int64)
    out[np.asarray(d["rid"])] = np.asarray(d["c"])
    return out


def _inst_finish_counts(shaped, body, pcares, rel, n_rules,
                        pcaraw=None, bscore=None):
    """measures_constants.inst_finish from per-rule COUNT arrays (body /
    restricted / raw-restricted), branch laws unchanged
    (RuleCounting.scala:268-286)."""
    rids = shaped["rid"].to_numpy()
    p = shaped["p"].to_numpy()
    hside = shaped["hside"].to_numpy()
    fvpos = shaped["fvpos"].to_numpy()
    is_r = hside == fvpos
    if pcaraw is not None:
        nent = rel.nent(p, hside)
        use_b = is_r & (bscore >= nent)
        pca = np.where(
            ~is_r, body[rids].astype(np.float64),
            np.where(use_b, pcaraw[rids], pcares[rids]).astype(np.float64),
        )
    else:
        pca = np.where(is_r, pcares[rids].astype(np.float64),
                       body[rids].astype(np.float64))
    has = body[rids] > 0
    return pd.DataFrame({
        "rid": rids,
        "body_size": np.where(has, body[rids], np.nan),
        "pca_body_size": np.where(has, pca, np.nan),
    })


def _s4_sizes(con, R, rel, injective):
    """{VV(a,b), CAtom(x)} body/pca sizes (measures_constants s4).
    DuckDB expansion -> distinct pairs; numpy finish."""
    s4 = R[R["shape"] == "s4"]
    if not len(s4):
        return None
    base = pd.concat(
        [s4[["rid", "p"]].reset_index(drop=True),
         _vv_fields(s4, "_vv0", "?a", "a1").reset_index(drop=True),
         _ca_fields(s4, "_inst0", "c1").reset_index(drop=True)],
        axis=1,
    )
    base["hside"] = rel.hside_by_code[base["p"].to_numpy()]
    inj_sql = ""
    if injective:
        base["vsz"] = rel.psz_by_code[base["a1q"].to_numpy()]
        base["csz"] = rel.casize(base, "c1q2", "c1cst", "c1e")
        # head-instance + body-triple reuse exclusions (AtomCounting
        # .scala:159-216; see measures_constants s4 for the derivation)
        inj_sql = """
          AND bb.x <> bb.y
          AND NOT (
            f.csz <= f.vsz AND f.c1q2 = f.p AND (
              (f.c1u = 0 AND f.c1e = 0 AND bb.y = f.c1cst)
              OR (f.c1u = 1 AND f.c1e = 1 AND bb.x = f.c1cst)
            )
          )
          AND NOT (
            f.a1q = f.c1q2 AND (
              (f.c1u = 0 AND bb.y = f.c1cst
               AND ((f.c1e = 0 AND f.a1d = 0) OR (f.c1e = 1 AND f.a1d = 1)))
              OR (f.c1u = 1 AND bb.x = f.c1cst
               AND ((f.c1e = 0 AND f.a1d = 1) OR (f.c1e = 1 AND f.a1d = 0)))
            )
          )"""
    con.register("s4f", base)
    pairs = con.execute(f"""
        SELECT DISTINCT f.rid, f.p, f.hside,
               bb.x AS va, bb.y AS vb
        FROM s4f f
        JOIN bb ON f.a1q = bb.q AND f.a1d = bb.d
        JOIN E ON f.c1q2 = E.q2 AND f.c1cst = E.cst AND f.c1e = E.e
          AND E.x = CASE WHEN f.c1u = 0 THEN bb.x ELSE bb.y END
        WHERE true {inj_sql}""").df()
    con.unregister("s4f")
    n_rules = int(R["rid"].max()) + 1 if len(R) else 0
    body = np.bincount(pairs["rid"].to_numpy(), minlength=n_rules)
    hvv = np.where(pairs["hside"].to_numpy() == 0, pairs["va"].to_numpy(),
                   pairs["vb"].to_numpy())
    inp = rel.se_member(pairs["p"].to_numpy(), pairs["hside"].to_numpy(),
                        hvv)
    pca = np.bincount(pairs["rid"].to_numpy()[inp], minlength=n_rules)
    rids = s4["rid"].to_numpy()
    has = body[rids] > 0
    return pd.DataFrame({
        "rid": rids,
        "body_size": np.where(has, body[rids], np.nan),
        # Spark: pca count left-joined onto pairs-per-rid groupBy — a rule
        # with pairs but none surviving PCA gets NULL (not 0)
        "pca_body_size": np.where(pca[rids] > 0, pca[rids], np.nan),
    })


def _s5_sizes(con, R, rel, injective):
    """{CAtom(a), CAtom(b)} body/pca sizes (measures_constants s5; the
    injective branch is the factorized exclusion law). DuckDB
    aggregates; the law itself in numpy."""
    s5 = R[R["shape"] == "s5"]
    if not len(s5):
        return None
    norm0 = pd.concat(
        [s5[["rid", "p"]].reset_index(drop=True),
         _ca_fields(s5, "_inst0", "c1").reset_index(drop=True),
         _ca_fields(s5, "_inst1", "c2").reset_index(drop=True)],
        axis=1,
    )
    norm0["hside"] = rel.hside_by_code[norm0["p"].to_numpy()]
    n_rules = int(R["rid"].max()) + 1
    rids = norm0["rid"].to_numpy()
    if not injective:
        con.register("s5f", norm0)

        def ca_counts(pfx):
            agg = con.execute(f"""
                SELECT f.rid, count(*) AS n,
                       count(se.x) AS np
                FROM s5f f
                JOIN E ON f.{pfx}q2 = E.q2 AND f.{pfx}cst = E.cst
                      AND f.{pfx}e = E.e
                LEFT JOIN SE se ON se.p = f.p AND se.pos = f.hside
                      AND se.x = E.x
                GROUP BY f.rid""").df()
            n = np.zeros(n_rules, dtype=np.int64)
            n[agg["rid"].to_numpy()] = agg["n"].to_numpy()
            npc = np.zeros(n_rules, dtype=np.int64)
            npc[agg["rid"].to_numpy()] = agg["np"].to_numpy()
            on_hs = (
                ((norm0[f"{pfx}u"].to_numpy() == 0)
                 & (norm0["hside"].to_numpy() == 0))
                | ((norm0[f"{pfx}u"].to_numpy() == 1)
                   & (norm0["hside"].to_numpy() == 1))
            )
            return n, npc, on_hs

        c1n, c1np, c1hs = ca_counts("c1")
        c2n, c2np, _ = ca_counts("c2")
        con.unregister("s5f")
        # inner join semantics: both atoms must have matched
        has = (c1n[rids] > 0) & (c2n[rids] > 0)
        body = c1n[rids] * c2n[rids]
        pca = np.where(c1hs, c1np[rids] * c2n[rids],
                       c1n[rids] * c2np[rids])
        return pd.DataFrame({
            "rid": rids,
            "body_size": np.where(has, body, np.nan),
            "pca_body_size": np.where(has, pca, np.nan),
        })
    # ---- injective: normalize to the ?a (A) / ?b (B) sides ----
    a_is_c1 = norm0["c1u"].to_numpy() == 0
    norm = pd.DataFrame({
        "rid": norm0["rid"].to_numpy(), "p": norm0["p"].to_numpy(),
        "hside": norm0["hside"].to_numpy(),
        "Aq2": np.where(a_is_c1, norm0["c1q2"], norm0["c2q2"]),
        "Acst": np.where(a_is_c1, norm0["c1cst"], norm0["c2cst"]),
        "Ae": np.where(a_is_c1, norm0["c1e"], norm0["c2e"]),
        "Bq2": np.where(a_is_c1, norm0["c2q2"], norm0["c1q2"]),
        "Bcst": np.where(a_is_c1, norm0["c2cst"], norm0["c1cst"]),
        "Be": np.where(a_is_c1, norm0["c2e"], norm0["c1e"]),
    })
    con.register("s5n", norm)
    con.execute("""
        CREATE OR REPLACE TEMP TABLE exp5 AS
        SELECT f.rid, 0 AS side, E.x, f.Acst, f.Bcst,
               (f.hside <> 0 OR se.x IS NOT NULL) AS inp
        FROM s5n f
        JOIN E ON f.Aq2 = E.q2 AND f.Acst = E.cst AND f.Ae = E.e
        LEFT JOIN SE se ON se.p = f.p AND se.pos = 0 AND se.x = E.x
        UNION ALL
        SELECT f.rid, 1 AS side, E.x, f.Acst, f.Bcst,
               (f.hside <> 1 OR se.x IS NOT NULL) AS inp
        FROM s5n f
        JOIN E ON f.Bq2 = E.q2 AND f.Bcst = E.cst AND f.Be = E.e
        LEFT JOIN SE se ON se.p = f.p AND se.pos = 1 AND se.x = E.x""")
    agg = con.execute("""
        SELECT rid,
          count(*) FILTER (WHERE side = 0) AS nA,
          count(*) FILTER (WHERE side = 1) AS nB,
          count(*) FILTER (WHERE side = 0 AND inp) AS nAp,
          count(*) FILTER (WHERE side = 1 AND inp) AS nBp,
          max(CASE WHEN side = 1 AND x = Acst THEN 1 ELSE 0 END) AS mAB,
          max(CASE WHEN side = 0 AND x = Acst THEN 1 ELSE 0 END) AS mAA,
          max(CASE WHEN side = 0 AND x = Bcst THEN 1 ELSE 0 END) AS mBA,
          max(CASE WHEN side = 1 AND x = Bcst THEN 1 ELSE 0 END) AS mBB,
          max(CASE WHEN side = 1 AND inp AND x = Acst THEN 1 ELSE 0 END)
            AS mABp,
          max(CASE WHEN side = 0 AND inp AND x = Acst THEN 1 ELSE 0 END)
            AS mAAp,
          max(CASE WHEN side = 0 AND inp AND x = Bcst THEN 1 ELSE 0 END)
            AS mBAp,
          max(CASE WHEN side = 1 AND inp AND x = Bcst THEN 1 ELSE 0 END)
            AS mBBp
        FROM exp5 GROUP BY rid""").df()
    dd = con.execute("""
        SELECT rid, count(*) AS D,
               count(*) FILTER (WHERE allp) AS Dp
        FROM (
          SELECT rid, x, count(DISTINCT side) AS ns,
                 bool_and(inp) AS allp
          FROM exp5 GROUP BY rid, x
        ) WHERE ns = 2 GROUP BY rid""").df()
    con.unregister("s5n")

    def arr(df, col):
        out = np.zeros(n_rules, dtype=np.int64)
        out[df["rid"].to_numpy()] = df[col].to_numpy().astype(np.int64)
        return out

    cols = {c: arr(agg, c) for c in
            ("nA", "nB", "nAp", "nBp", "mAB", "mAA", "mBA", "mBB",
             "mABp", "mAAp", "mBAp", "mBBp")}
    D, Dp = arr(dd, "D"), arr(dd, "Dp")
    a1 = ((norm["Ae"].to_numpy() == 0)
          & (norm["Aq2"].to_numpy() == norm["p"].to_numpy())).astype(np.int64)
    a2 = ((norm["Be"].to_numpy() == 1)
          & (norm["Bq2"].to_numpy() == norm["p"].to_numpy())).astype(np.int64)
    aT = ((norm["Aq2"].to_numpy() == norm["Bq2"].to_numpy())
          & (norm["Ae"].to_numpy() != norm["Be"].to_numpy())).astype(np.int64)
    ne = (norm["Acst"].to_numpy() != norm["Bcst"].to_numpy()).astype(np.int64)

    def law(nA_, nB_, D_, mAB_, mAA_, mBA_, mBB_):
        h1 = a1 * mAB_[rids] * (nA_[rids] - mAA_[rids])
        h2 = a2 * mBA_[rids] * (nB_[rids] - mBB_[rids])
        P = mBA_[rids] * mAB_[rids] * ne
        return (
            nA_[rids] * nB_[rids] - D_[rids] - h1 - h2
            - aT * P + a1 * a2 * P + a1 * aT * P + a2 * aT * P
            - a1 * a2 * aT * P
        )

    body = law(cols["nA"], cols["nB"], D, cols["mAB"], cols["mAA"],
               cols["mBA"], cols["mBB"])
    pca = law(cols["nAp"], cols["nBp"], Dp, cols["mABp"], cols["mAAp"],
              cols["mBAp"], cols["mBBp"])
    # a rule with NO entity-expansion rows at all is absent from the
    # distributed agg -> null sizes after the left join
    present = (cols["nA"][rids] > 0) | (cols["nB"][rids] > 0)
    return pd.DataFrame({
        "rid": rids,
        "body_size": np.where(present, body, np.nan),
        "pca_body_size": np.where(present, pca, np.nan),
    })


def _s6_bindings(con, shaped):
    base = pd.concat(
        [shaped[["rid"]].reset_index(drop=True),
         _ca_fields(shaped, "_inst0", "c1").reset_index(drop=True)],
        axis=1,
    )
    con.register("s6f", base)
    con.execute("""
        CREATE OR REPLACE TEMP TABLE b6 AS
        SELECT DISTINCT f.rid, E.x AS v FROM s6f f
        JOIN E ON f.c1q2 = E.q2 AND f.c1cst = E.cst AND f.c1e = E.e""")
    con.unregister("s6f")
    return "SELECT rid, v FROM b6"


def _s9_bindings(con, shaped, injective):
    base = pd.concat(
        [shaped[["rid"]].reset_index(drop=True),
         _ca_fields(shaped, "_inst0", "c1").reset_index(drop=True),
         _ca_fields(shaped, "_inst1", "c2").reset_index(drop=True)],
        axis=1,
    )
    con.register("s9f", base)
    inj_sql = ""
    if injective:
        # the two CA instances must be DISTINCT triples: equal only when
        # cross-oriented with v == cst1 == cst2 and shared predicate
        inj_sql = """AND NOT (
            f.c1q2 = f.c2q2 AND f.c1e <> f.c2e
            AND e1.x = f.c1cst AND e1.x = f.c2cst)"""
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE b9 AS
        SELECT DISTINCT f.rid, e1.x AS v FROM s9f f
        JOIN E e1 ON f.c1q2 = e1.q2 AND f.c1cst = e1.cst AND f.c1e = e1.e
        JOIN E e2 ON f.c2q2 = e2.q2 AND f.c2cst = e2.cst AND f.c2e = e2.e
          AND e2.x = e1.x
        WHERE true {inj_sql}""")
    con.unregister("s9f")
    return "SELECT rid, v FROM b9"


def _s78_sizes(con, R, rel, shape, injective, fvar_arr, n_rules):
    """s7 {VV,VV} / s8 {VV,CA} sizes with the branch-A/B PCA machinery
    (measures_constants s7/s8 loop body). DuckDB expansion; numpy
    branch assembly via _inst_finish."""
    shaped = R[R["shape"] == shape]
    if not len(shaped):
        return None
    fv = fvar_arr[shaped.index]
    comp = shaped[["rid", "p", "hside", "fvpos", "hA"]].reset_index(
        drop=True
    ).copy()
    ua = R.attrs["ua"]
    ids = shaped["_vv0"].to_numpy()
    comp["a1q"] = ua["q"][np.maximum(ids, 0)]
    # a1 direction: d=0 ('f') when the FREE VAR is at subject
    comp["a1d"] = np.where(
        ua["s_var"][np.maximum(ids, 0)] == fv, 0, 1
    ).astype(np.int64)
    if shape == "s7":
        ids2 = shaped["_vv1"].to_numpy()
        comp["a2q"] = ua["q"][np.maximum(ids2, 0)]
        comp["a2d"] = np.where(
            ua["s_var"][np.maximum(ids2, 0)] == fv, 0, 1
        ).astype(np.int64)
        sz1 = rel.psz_by_code[comp["a1q"].to_numpy()]
        sz2 = rel.psz_by_code[comp["a2q"].to_numpy()]
        comp["_sz1"], comp["_sz2"] = sz1, sz2
        comp["_bscore"] = np.minimum(sz1, sz2)
        join2 = """JOIN bb b2 ON f.a2q = b2.q AND f.a2d = b2.d
                   AND b2.x = b1.x AND b2.y = b1.y"""
    else:
        cf = _ca_fields(shaped, "_inst0", "c1").reset_index(drop=True)
        comp = pd.concat([comp, cf], axis=1)
        sz1 = rel.psz_by_code[comp["a1q"].to_numpy()]
        csz = rel.casize(comp, "c1q2", "c1cst", "c1e")
        comp["_sz1"], comp["_csz"] = sz1, csz
        comp["_bscore"] = np.minimum(sz1, csz)
        join2 = """JOIN E ON f.c1q2 = E.q2 AND f.c1cst = E.cst
                   AND f.c1e = E.e AND E.x = b1.y"""
    con.register("cmp", comp)
    inj_vc = "AND b1.x <> b1.y" if injective else ""
    excl_expr = None
    if injective:
        # head-instance reuse exclusions (AtomCounting.scala:159-216 —
        # see measures_constants s7/s8 for the bestAtom-order derivation)
        vv1 = ("(b1.y = f.hA AND f.a1q = f.p AND f.a1d = "
               "CASE WHEN f.fvpos = 0 THEN 0 ELSE 1 END)")
        if shape == "s7":
            vv2 = ("(b1.y = f.hA AND f.a2q = f.p AND f.a2d = "
                   "CASE WHEN f.fvpos = 0 THEN 0 ELSE 1 END)")
            first1 = "(f._sz1 < f._sz2 OR (f._sz1 = f._sz2 AND f.a1d = 1))"
            excl_expr = f"(CASE WHEN {first1} THEN {vv1} ELSE {vv2} END)"
        else:
            ca_head = """(f._csz <= f._sz1 AND f.c1q2 = f.p AND (
                (f.fvpos = 1 AND f.c1e = 0 AND b1.y = f.hA
                 AND f.c1cst = b1.x)
                OR (f.fvpos = 0 AND f.c1e = 1 AND f.c1cst = b1.x
                    AND b1.y = f.hA)))"""
            ca_reuse = """(f.a1q = f.c1q2 AND b1.x = f.c1cst AND (
                (f.a1d = 0 AND f.c1e = 1) OR (f.a1d = 1 AND f.c1e = 0)))"""
            excl_expr = f"({vv1} OR {ca_head} OR {ca_reuse})"
    if excl_expr is not None:
        # one expansion, exclusion law as a flag column: the raw set
        # (branch-B PCA) and the excluded binding set share the join;
        # counts happen in DuckDB (_binding_counts), never shipping the
        # multi-million-row binding sets to Python
        con.execute(f"""
            CREATE OR REPLACE TEMP TABLE jj78 AS
            SELECT f.rid, b1.x AS v, NOT {excl_expr} AS keep
            FROM cmp f JOIN bb b1 ON f.a1q = b1.q AND f.a1d = b1.d
            {join2}
            WHERE true {inj_vc}""")
        raw_src = "SELECT DISTINCT rid, v FROM jj78"
        bind_src = "SELECT DISTINCT rid, v FROM jj78 WHERE keep"
    else:
        con.execute(f"""
            CREATE OR REPLACE TEMP TABLE jj78 AS
            SELECT DISTINCT f.rid, b1.x AS v
            FROM cmp f JOIN bb b1 ON f.a1q = b1.q AND f.a1d = b1.d
            {join2}
            WHERE true""")
        raw_src = bind_src = "SELECT rid, v FROM jj78"
    con.unregister("cmp")
    body = _binding_counts(con, bind_src, n_rules, restricted=False)
    pcares = _binding_counts(con, bind_src, n_rules, restricted=True)
    pcaraw = _binding_counts(con, raw_src, n_rules, restricted=True)
    return _inst_finish_counts(shaped, body, pcares, rel, n_rules,
                               pcaraw=pcaraw,
                               bscore=comp["_bscore"].to_numpy())


def confidences_constants_local(
    rules_pdf: pd.DataFrame, tpdf: pd.DataFrame, injective: bool = False
) -> pd.DataFrame:
    """Pandas replica of measures_constants.confidences_constants: rules
    rows + (rid, body_size, pca_body_size, cwa_confidence,
    pca_confidence). Where the distributed path would raise (ANSI divide
    by zero on a 0 pca body), the local path emits null instead — the
    only intentional divergence."""
    enc = _Enc(tpdf)
    R = _parse_rules(rules_pdf, enc)
    # _Rel is built AFTER parsing so its code space (and hside table)
    # covers codes added for rule-only terms
    rel = _Rel(enc, injective)
    # R joins broadcast(side) INNER in the distributed path: rules whose
    # head predicate is absent from `triples` drop out entirely
    R["hside"] = rel.hside_by_code[R["p"].to_numpy()]
    keep_mask = R["hside"].to_numpy() >= 0
    R = R[keep_mask].reset_index(drop=True)
    n_rules = len(rules_pdf)
    # fvar per rule: ?a when the head subject is the variable
    fvar_arr = np.where(R["fvpos"].to_numpy() == 0, "?a", "?b").astype(
        object
    )

    con = _duck()
    con.register("E", rel.E)
    con.register("SE", rel.SE)
    con.register("bb", rel.b)
    meta = R[["rid", "p", "hside", "fvpos"]]
    con.register("meta", meta)
    parts = [
        _varonly_sizes(R, rel, injective),
        _s4_sizes(con, R, rel, injective),
        _s5_sizes(con, R, rel, injective),
    ]

    def inst_counts(shaped, src):
        body = _binding_counts(con, src, n_rules, restricted=False)
        pcares = _binding_counts(con, src, n_rules, restricted=True)
        return _inst_finish_counts(shaped, body, pcares, rel, n_rules)

    s6 = R[R["shape"] == "s6"]
    if len(s6):
        parts.append(inst_counts(s6, _s6_bindings(con, s6)))
    s9 = R[R["shape"] == "s9"]
    if len(s9):
        parts.append(inst_counts(s9, _s9_bindings(con, s9, injective)))
    parts.append(_s78_sizes(con, R, rel, "s7", injective, fvar_arr,
                            n_rules))
    parts.append(_s78_sizes(con, R, rel, "s8", injective, fvar_arr,
                            n_rules))
    con.close()
    parts = [p for p in parts if p is not None and len(p)]
    if parts:
        sizes = pd.concat(parts, ignore_index=True).set_index("rid")
    else:
        sizes = pd.DataFrame(
            {"body_size": [], "pca_body_size": []}, dtype=float
        )

    out = rules_pdf.iloc[np.flatnonzero(keep_mask)].reset_index(
        drop=True
    ).copy()
    kept_rids = R["rid"].to_numpy()
    out["rid"] = _cat(
        out["head"].to_numpy(dtype=object), "<-",
        np.asarray([";".join(a) for a in out["atoms"]], dtype=object),
    )
    bs = sizes["body_size"].reindex(kept_rids).to_numpy(dtype=np.float64)
    ps = sizes["pca_body_size"].reindex(kept_rids).to_numpy(
        dtype=np.float64
    )
    sup = out["support"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out["body_size"] = pd.Series(bs).astype("Int64")
        out["pca_body_size"] = pd.Series(ps).astype("Int64")
        out["cwa_confidence"] = np.where(
            (bs > 0), sup / bs, np.nan
        )
        out["pca_confidence"] = np.where(
            (ps > 0), sup / ps, np.nan
        )
    return out[[
        "rid", "head", "p", "atoms", "shape", "support", "head_size",
        "head_coverage", "body_size", "pca_body_size", "cwa_confidence",
        "pca_confidence",
    ]]
