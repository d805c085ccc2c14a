"""Star-schema scale fixtures for the relational scaling study.

The driver testdata stops at sf0.1 and is read-only, so scale
evidence beyond that needs generated corpora. This writes the
TPC-H-ish star tables (region nation customer supplier part orders
lineitem) INTO an existing tools/scale_fixtures.py dir at the same
statistical shape as the driver data (measured at sf0.01, seed 42):

  customer (150,000 x sf): c_nationkey uniform 0..24, acctbal
      U(-1000, 10000), 5 mktsegments
  supplier (10,000 x sf): same nation/acctbal shape
  part     (200,000 x sf): 25 brands, 6 single-word types, 16-word
      two-word names, size 1..50, retailprice U(900, 1000)
  orders   (1,500,000 x sf): 10 orders/customer, dates uniform
      1995-01-01..2001-08-01, 3 statuses, 5 priorities,
      totalprice U(1000, 500000)
  lineitem (~6,000,000 x sf): lines/order ~ 1 + Poisson(3) clipped
      to 13, qty U{1..50}, extendedprice U(900, 105000), discount
      {0..0.10 step .01}, tax {0..0.08 step .01}, 3 returnflags x
      2 linestatuses, shipdate uniform over 1995..2001

Deterministic (seed arg, default 42). Usage:
    python tools/scale_star_fixtures.py <out_dir> <sf> [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CUST_PER_SF = 150_000
SUPP_PER_SF = 10_000
PART_PER_SF = 200_000
ORDERS_PER_CUST = 10

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUSES = ["P", "O", "F"]
_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_ADJ = ["small", "old", "new", "blue", "cold", "hot", "red", "large"]
_NOUN = ["bolt", "widget", "rod", "anvil", "ring", "gear", "plate", "gizmo"]
_RFLAG = ["A", "N", "R"]
_LSTATUS = ["F", "O"]

_EPOCH_95 = np.datetime64("1995-01-01")
_ORDER_DAYS = int(
    (np.datetime64("2001-08-01") - _EPOCH_95) / np.timedelta64(1, "D")
)
_SHIP_DAYS = int(
    (np.datetime64("2001-11-04") - _EPOCH_95) / np.timedelta64(1, "D")
)


def _ts(days: np.ndarray) -> pa.Array:
    return pa.array(
        (_EPOCH_95 + days.astype("timedelta64[D]")).astype("datetime64[us]")
    )


def generate(out_dir: str, sf: float, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = round(CUST_PER_SF * sf)
    n_supp = round(SUPP_PER_SF * sf)
    n_part = round(PART_PER_SF * sf)
    n_ord = n_cust * ORDERS_PER_CUST

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
        os.path.join(out_dir, "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        os.path.join(out_dir, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(_SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
        os.path.join(out_dir, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
        os.path.join(out_dir, "supplier.parquet"),
    )
    adj = np.array(_ADJ)[rng.integers(0, len(_ADJ), n_part)]
    noun = np.array(_NOUN)[rng.integers(0, len(_NOUN), n_part)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
                "p_brand": pa.array(
                    [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]
                ),
                "p_type": pa.array(
                    np.array(_TYPES)[rng.integers(0, len(_TYPES), n_part)]
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
        os.path.join(out_dir, "part.parquet"),
    )
    okey = np.arange(n_ord)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okey, pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(_STATUSES)[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _ts(rng.integers(0, _ORDER_DAYS + 1, n_ord)),
                "o_orderpriority": pa.array(
                    np.array(_PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
    )
    lines = np.clip(1 + rng.poisson(3.0, n_ord), 1, 13)
    lkey = np.repeat(okey, lines)
    n_li = lkey.size
    linenum = np.concatenate([np.arange(1, c + 1) for c in lines])
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lkey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(linenum, pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(_RFLAG)[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(_LSTATUS)[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts(rng.integers(1, _SHIP_DAYS + 1, n_li)),
            }
        ),
        os.path.join(out_dir, "lineitem.parquet"),
    )
    print(
        f"wrote {out_dir}: customer={n_cust} supplier={n_supp} "
        f"part={n_part} orders={n_ord} lineitem={n_li}"
    )


if __name__ == "__main__":
    generate(sys.argv[1], float(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 42)
