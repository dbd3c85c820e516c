"""One DuckDB twin in ONE process: `python _twin_one.py <sf_dir> <name>
<cap_sec>` prints a single JSON line {name: seconds | "N+" | {error}}.

Process-per-twin is the bench_sf10 isolation contract (r8, measured):
a disk-full spill poisons the shared buffer pool, and even a CLOSED
connection does not return process memory — the next twin then OOMs on
kilobyte allocations. The wall-clock cap interrupts in-process; a
capped twin records a "+"-marked lower bound, a genuine failure records
the error. Startup (interpreter + view registration) happens before the
timer starts and is excluded from the timing."""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from bench_sf1 import _duck_con  # noqa: E402


def main() -> None:
    sf_dir, name, cap = sys.argv[1], sys.argv[2], float(sys.argv[3])
    import __spark_entry__ as entry_mod
    from hashquery_spark.py_twins import PY_TWINS

    oracles = entry_mod.oracle_sql()
    py_twins = {n: fn for n, (fn, _o) in PY_TWINS.items()}
    con = _duck_con(sf_dir)
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_sf10_spill'")
    timer = threading.Timer(cap, con.interrupt)
    timer.start()
    t = time.perf_counter()
    timed_out = False
    error = None
    try:
        if name in oracles:
            con.execute(oracles[name]).fetchall()
        else:
            py_twins[name](con)
    except duckdb.InterruptException:
        timed_out = True
    except Exception as exc:
        error = f"{type(exc).__name__}: {exc}"
    finally:
        timer.cancel()
    el = round(time.perf_counter() - t, 3)
    v = (
        {"error": error, "elapsed_sec": el}
        if error
        else (f"{el}+" if timed_out else el)
    )
    print(json.dumps({name: v}))


if __name__ == "__main__":
    main()
