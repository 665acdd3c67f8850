"""TPC-H data generator (clean-room, vectorized numpy).

Replaces the reference's third-party C dbgen (benchmarks/tpch/dbgen/) with an
independent implementation of the TPC-H schema and distributions: same table
cardinalities per scale factor, the spec's partsupp/lineitem supplier formula (join-key
distribution fidelity), date windows, and comment text with the pattern phrases the
queries probe for ('special…requests', 'Customer…Complaints', 'forest…'). Output is not
byte-identical to official dbgen — correctness is checked against a sqlite3 oracle over
the *same* generated data, so only distributional fidelity matters for benchmarking.

Deterministic for a given (scale, seed).
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List

import numpy as np

from quickstep_tpu.types import (
    Type, TypeID, INT, DOUBLE, DATE, Char, VarChar, Decimal,
)
from quickstep_tpu.types.datetime_util import date_encode
from quickstep_tpu.storage.column import Column
from quickstep_tpu.storage.dictionary import Dictionary
from quickstep_tpu.storage.table import TableData

# ---------------------------------------------------------------------
# vocabularies (TPC-H spec 4.2.2.13 style)
# ---------------------------------------------------------------------

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
INSTRUCTS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_S2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished", "chartreuse",
    "chiffon", "chocolate", "coral", "cornflower", "cornsilk", "cream", "cyan",
    "dark", "deep", "dim", "dodger", "drab", "firebrick", "floral", "forest",
    "frosted", "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew",
    "hot", "hazelnut", "indian", "ivory", "khaki", "lace", "lavender", "lawn",
    "lemon", "light", "lime", "linen", "magenta", "maroon", "medium", "metallic",
    "midnight", "mint", "misty", "moccasin", "navajo", "navy", "olive", "orange",
    "orchid", "pale", "papaya", "peach", "peru", "pink", "plum", "powder",
    "puff", "purple", "red", "rose", "rosy", "royal", "saddle", "salmon",
    "sandy", "seashell", "sienna", "sky", "slate", "smoke", "snow", "spring",
    "steel", "tan", "thistle", "tomato", "turquoise", "violet", "wheat", "white",
    "yellow",
]
WORDS = COLORS + ["the", "quick", "ironic", "final", "bold", "furious", "slyly",
                  "carefully", "blithely", "express", "regular", "pending",
                  "deposits", "foxes", "pinto", "beans", "accounts", "packages",
                  "theodolites", "instructions", "dependencies", "requests",
                  "platelets", "ideas", "asymptotes", "somas", "dugouts"]

_EPOCH = _dt.date(1992, 1, 1)
_DATE_CODES = None  # lazily built day-number -> packed code lookup


def _date_code_table(n_days: int = 2700) -> np.ndarray:
    global _DATE_CODES
    if _DATE_CODES is None or len(_DATE_CODES) < n_days:
        codes = np.empty(n_days, dtype=np.int32)
        for i in range(n_days):
            d = _EPOCH + _dt.timedelta(days=i)
            codes[i] = date_encode(d.year, d.month, d.day)
        _DATE_CODES = codes
    return _DATE_CODES


def _dates_from_daynum(day_nums: np.ndarray) -> np.ndarray:
    tbl = _date_code_table(int(day_nums.max()) + 1 if day_nums.size else 1)
    return tbl[day_nums]


def _text_column(rng, n: int, min_words: int, max_words: int,
                 inject: str = None, inject_prob: float = 0.0) -> np.ndarray:
    """Random word strings (vectorized numpy string joins — scales to SF1+);
    optionally inject a two-word pattern 'a...b' so LIKE '%a%b%' predicates
    select a small fraction."""
    word_arr = np.array(WORDS)
    counts = rng.integers(min_words, max_words + 1, n)
    idx = rng.integers(0, len(WORDS), (n, max_words))
    out = word_arr[idx[:, 0]].astype(object)
    for j in range(1, max_words):
        wj = np.where(j < counts, word_arr[idx[:, j]], "")
        sep = np.where(j < counts, " ", "")
        out = np.char.add(np.char.add(out.astype(str), sep), wj)
    if inject:
        w1, w2 = inject.split()
        hit = rng.random(n) < inject_prob
        if hit.any():
            suffix = f" {w1} of {w2}"
            out = np.where(hit, np.char.add(out.astype(str), suffix), out)
    return np.asarray(out, dtype=object)


def _phone(rng, nation: np.ndarray) -> np.ndarray:
    a = (nation + 10).astype(str)
    b = rng.integers(100, 1000, len(nation)).astype(str)
    c = rng.integers(100, 1000, len(nation)).astype(str)
    d = rng.integers(1000, 10000, len(nation)).astype(str)
    out = np.char.add(np.char.add(a, "-"), b)
    out = np.char.add(np.char.add(out, "-"), c)
    out = np.char.add(np.char.add(out, "-"), d)
    return out.astype(object)


# Money columns are DECIMAL(9,2): generated directly as exact integer cents
# (the scaled-units device encoding, types/types.py DECIMAL), so no float
# rounding ever enters the stored data.
MONEY = Decimal(9, 2)


def _money_units(rng, lo_cents: int, hi_cents: int, n: int) -> np.ndarray:
    return rng.integers(lo_cents, hi_cents + 1, n)


def _col_str(typ, values: List[str]) -> Column:
    d, codes = Dictionary.build(values)
    return Column(typ, codes, None, d)


def _col(typ, arr) -> Column:
    return Column(typ, np.asarray(arr, dtype=typ.device_dtype), None, None)


# ---------------------------------------------------------------------

def generate(scale: float = 0.01, seed: int = 0) -> Dict[str, TableData]:
    """Generate all 8 TPC-H tables at the given scale factor."""
    rng = np.random.default_rng(seed)
    S = max(int(10_000 * scale), 10)        # suppliers
    P = max(int(200_000 * scale), 200)      # parts
    C = max(int(150_000 * scale), 150)      # customers
    O = max(int(1_500_000 * scale), 1500)   # orders
    out: Dict[str, TableData] = {}

    # ---- region ----
    out["region"] = TableData({
        "r_regionkey": _col(INT, np.arange(5)),
        "r_name": _col_str(Char(25), REGIONS),
        "r_comment": _col_str(VarChar(152), _text_column(rng, 5, 4, 10)),
    })

    # ---- nation ----
    nk = np.arange(25)
    out["nation"] = TableData({
        "n_nationkey": _col(INT, nk),
        "n_name": _col_str(Char(25), [n for n, _ in NATIONS]),
        "n_regionkey": _col(INT, np.asarray([r for _, r in NATIONS])),
        "n_comment": _col_str(VarChar(152), _text_column(rng, 25, 4, 10)),
    })

    # ---- supplier ----
    sk = np.arange(1, S + 1)
    s_nation = rng.integers(0, 25, S)
    out["supplier"] = TableData({
        "s_suppkey": _col(INT, sk),
        "s_name": _col_str(Char(25), list(np.char.add("Supplier#",
            np.char.zfill(sk.astype(str), 9)))),
        "s_address": _col_str(VarChar(40), _text_column(rng, S, 2, 4)),
        "s_nationkey": _col(INT, s_nation),
        "s_phone": _col_str(Char(15), _phone(rng, s_nation)),
        "s_acctbal": _col(MONEY, _money_units(rng, -99999, 999999, S)),
        # Q16 probes '%Customer%Complaints%'
        "s_comment": _col_str(VarChar(101), _text_column(
            rng, S, 5, 12, inject="Customer Complaints", inject_prob=0.0005)),
    })

    # ---- part ----
    pk = np.arange(1, P + 1)
    name_words = np.array(COLORS)
    pidx = rng.integers(0, len(COLORS), (P, 5))
    pname = name_words[pidx[:, 0]]
    for j in range(1, 5):
        pname = np.char.add(np.char.add(pname, " "), name_words[pidx[:, j]])
    pname = list(pname)
    p_mfgr_i = rng.integers(1, 6, P)
    p_brand_i = p_mfgr_i * 10 + rng.integers(1, 6, P)
    t1 = np.array(TYPE_S1)[rng.integers(0, 6, P)]
    t2 = np.array(TYPE_S2)[rng.integers(0, 5, P)]
    t3 = np.array(TYPE_S3)[rng.integers(0, 5, P)]
    ptype = list(np.char.add(np.char.add(np.char.add(np.char.add(t1, " "), t2),
                                         " "), t3))
    pcontainer = list(np.char.add(np.char.add(
        np.array(CONTAINER_S1)[rng.integers(0, 5, P)], " "),
        np.array(CONTAINER_S2)[rng.integers(0, 8, P)]))
    # spec retail price formula (keeps price/partkey correlation) — the spec
    # formula is already integer cents
    p_retail_cents = 90000 + ((pk // 10) % 20001) + 100 * (pk % 1000)
    out["part"] = TableData({
        "p_partkey": _col(INT, pk),
        "p_name": _col_str(VarChar(55), pname),
        "p_mfgr": _col_str(Char(25), [f"Manufacturer#{i}" for i in p_mfgr_i]),
        "p_brand": _col_str(Char(10), [f"Brand#{i}" for i in p_brand_i]),
        "p_type": _col_str(VarChar(25), ptype),
        "p_size": _col(INT, rng.integers(1, 51, P)),
        "p_container": _col_str(Char(10), pcontainer),
        "p_retailprice": _col(MONEY, p_retail_cents),
        "p_comment": _col_str(VarChar(23), _text_column(rng, P, 2, 5)),
    })

    # ---- partsupp (spec supplier-assignment formula: 4 suppliers per part) ----
    ps_part = np.repeat(pk, 4)
    i4 = np.tile(np.arange(4), P)
    ps_supp = ((ps_part + i4 * (S // 4 + (ps_part - 1) // S)) % S) + 1
    PS = len(ps_part)
    out["partsupp"] = TableData({
        "ps_partkey": _col(INT, ps_part),
        "ps_suppkey": _col(INT, ps_supp.astype(np.int64)),
        "ps_availqty": _col(INT, rng.integers(1, 10_000, PS)),
        "ps_supplycost": _col(MONEY, _money_units(rng, 100, 100000, PS)),
        "ps_comment": _col_str(VarChar(199), _text_column(rng, PS, 4, 10)),
    })

    # ---- customer ----
    ck = np.arange(1, C + 1)
    c_nation = rng.integers(0, 25, C)
    out["customer"] = TableData({
        "c_custkey": _col(INT, ck),
        "c_name": _col_str(VarChar(25), list(np.char.add("Customer#",
            np.char.zfill(ck.astype(str), 9)))),
        "c_address": _col_str(VarChar(40), _text_column(rng, C, 2, 4)),
        "c_nationkey": _col(INT, c_nation),
        "c_phone": _col_str(Char(15), _phone(rng, c_nation)),
        "c_acctbal": _col(MONEY, _money_units(rng, -99999, 999999, C)),
        "c_mktsegment": _col_str(Char(10), list(
            np.array(SEGMENTS)[rng.integers(0, 5, C)])),
        "c_comment": _col_str(VarChar(117), _text_column(
            rng, C, 5, 12, inject="special requests", inject_prob=0.01)),
    })

    # ---- orders (sparse keys x4; only customers with custkey%3 != 0) ----
    ok = np.arange(1, O + 1) * 4
    eligible = ck[ck % 3 != 0]
    o_cust = eligible[rng.integers(0, len(eligible), O)]
    # order dates: 1992-01-01 .. 1998-08-02 (2405 days)
    o_daynum = rng.integers(0, 2406, O)
    o_date = _dates_from_daynum(o_daynum)
    out["orders"] = TableData({
        "o_orderkey": _col(INT, ok),
        "o_custkey": _col(INT, o_cust),
        "o_orderstatus": None,      # filled after lineitem
        "o_totalprice": None,       # filled after lineitem
        "o_orderdate": _col(DATE, o_date),
        "o_orderpriority": _col_str(Char(15), list(
            np.array(PRIORITIES)[rng.integers(0, 5, O)])),
        "o_clerk": _col_str(Char(15), list(np.char.add("Clerk#",
            np.char.zfill(rng.integers(
                1, max(int(1000 * scale), 10) + 1, O).astype(str), 9)))),
        "o_shippriority": _col(INT, np.zeros(O, np.int64)),
        "o_comment": _col_str(VarChar(79), _text_column(rng, O, 5, 12)),
    })

    # ---- lineitem ----
    lines_per = rng.integers(1, 8, O)
    L = int(lines_per.sum())
    l_order = np.repeat(ok, lines_per)
    l_orderdate_daynum = np.repeat(o_daynum, lines_per)
    # vectorized 1..k per order: global index minus each row's order start
    ends = np.cumsum(lines_per)
    starts_ = ends - lines_per
    l_linenumber = np.arange(L) - np.repeat(starts_, lines_per) + 1
    l_part = rng.integers(1, P + 1, L)
    li4 = rng.integers(0, 4, L)
    l_supp = ((l_part + li4 * (S // 4 + (l_part - 1) // S)) % S) + 1
    l_qty = rng.integers(1, 51, L)                       # whole units
    l_extp_c = l_qty * p_retail_cents[l_part - 1]        # exact cents
    l_disc_u = rng.integers(0, 11, L)                    # 0.00..0.10 in cents
    l_tax_u = rng.integers(0, 9, L)                      # 0.00..0.08 in cents
    ship_daynum = l_orderdate_daynum + rng.integers(1, 122, L)
    commit_daynum = l_orderdate_daynum + rng.integers(30, 91, L)
    receipt_daynum = ship_daynum + rng.integers(1, 31, L)
    cutoff = (_dt.date(1995, 6, 17) - _EPOCH).days
    returnable = receipt_daynum <= cutoff
    rf = np.where(returnable,
                  np.where(rng.random(L) < 0.5, 0, 1),  # R or A
                  2)                                     # N
    rf_strs = np.array(["A", "R", "N"])
    ls = np.where(ship_daynum > cutoff, "O", "F")
    out["lineitem"] = TableData({
        "l_orderkey": _col(INT, l_order),
        "l_partkey": _col(INT, l_part),
        "l_suppkey": _col(INT, l_supp.astype(np.int64)),
        "l_linenumber": _col(INT, l_linenumber),
        "l_quantity": _col(MONEY, l_qty * 100),
        "l_extendedprice": _col(MONEY, l_extp_c),
        "l_discount": _col(MONEY, l_disc_u),
        "l_tax": _col(MONEY, l_tax_u),
        "l_returnflag": _col_str(Char(1), list(rf_strs[rf])),
        "l_linestatus": _col_str(Char(1), list(ls)),
        "l_shipdate": _col(DATE, _dates_from_daynum(ship_daynum)),
        "l_commitdate": _col(DATE, _dates_from_daynum(commit_daynum)),
        "l_receiptdate": _col(DATE, _dates_from_daynum(receipt_daynum)),
        "l_shipinstruct": _col_str(Char(25), list(
            np.array(INSTRUCTS)[rng.integers(0, 4, L)])),
        "l_shipmode": _col_str(Char(10), list(
            np.array(MODES)[rng.integers(0, 7, L)])),
        "l_comment": _col_str(VarChar(44), _text_column(rng, L, 2, 5)),
    })

    # ---- orders columns derived from lineitems ----
    # o_totalprice = sum(extp*(1+tax)*(1-disc)); o_orderstatus: F if all lines F,
    # O if all lines O, else P
    order_idx = np.repeat(np.arange(O), lines_per)
    # exact integer: per-line cents*(100+tax)*(100-disc) is scale-6 units;
    # the order total rounds the summed scale-6 value half-up to cents
    totals6 = np.zeros(O, np.int64)
    np.add.at(totals6, order_idx,
              l_extp_c.astype(np.int64) * (100 + l_tax_u) * (100 - l_disc_u))
    f_cnt = np.zeros(O, np.int64)
    np.add.at(f_cnt, order_idx, (ls == "F").astype(np.int64))
    status = np.where(f_cnt == lines_per, "F",
                      np.where(f_cnt == 0, "O", "P"))
    out["orders"].columns["o_orderstatus"] = _col_str(Char(1), list(status))
    out["orders"].columns["o_totalprice"] = _col(MONEY, (totals6 + 5000) // 10000)

    return out


TPCH_SCHEMAS = {
    "region": [("r_regionkey", INT), ("r_name", Char(25)),
               ("r_comment", VarChar(152))],
    "nation": [("n_nationkey", INT), ("n_name", Char(25)),
               ("n_regionkey", INT), ("n_comment", VarChar(152))],
    "supplier": [("s_suppkey", INT), ("s_name", Char(25)),
                 ("s_address", VarChar(40)), ("s_nationkey", INT),
                 ("s_phone", Char(15)), ("s_acctbal", MONEY),
                 ("s_comment", VarChar(101))],
    "part": [("p_partkey", INT), ("p_name", VarChar(55)), ("p_mfgr", Char(25)),
             ("p_brand", Char(10)), ("p_type", VarChar(25)), ("p_size", INT),
             ("p_container", Char(10)), ("p_retailprice", MONEY),
             ("p_comment", VarChar(23))],
    "partsupp": [("ps_partkey", INT), ("ps_suppkey", INT),
                 ("ps_availqty", INT), ("ps_supplycost", MONEY),
                 ("ps_comment", VarChar(199))],
    "customer": [("c_custkey", INT), ("c_name", VarChar(25)),
                 ("c_address", VarChar(40)), ("c_nationkey", INT),
                 ("c_phone", Char(15)), ("c_acctbal", MONEY),
                 ("c_mktsegment", Char(10)), ("c_comment", VarChar(117))],
    "orders": [("o_orderkey", INT), ("o_custkey", INT),
               ("o_orderstatus", Char(1)), ("o_totalprice", MONEY),
               ("o_orderdate", DATE), ("o_orderpriority", Char(15)),
               ("o_clerk", Char(15)), ("o_shippriority", INT),
               ("o_comment", VarChar(79))],
    "lineitem": [("l_orderkey", INT), ("l_partkey", INT), ("l_suppkey", INT),
                 ("l_linenumber", INT), ("l_quantity", MONEY),
                 ("l_extendedprice", MONEY), ("l_discount", MONEY),
                 ("l_tax", MONEY), ("l_returnflag", Char(1)),
                 ("l_linestatus", Char(1)), ("l_shipdate", DATE),
                 ("l_commitdate", DATE), ("l_receiptdate", DATE),
                 ("l_shipinstruct", Char(25)), ("l_shipmode", Char(10)),
                 ("l_comment", VarChar(44))],
}
