"""Slow-log parser golden tests.

Every fixture expectation from the reference suite
(/root/reference/log/parser/parser_test.go), run through our per-doc state
machine over the reference's own log fixtures. The comparison helper mirrors
the reference's IsDeeply (/root/reference/test/test.go:23-117): all struct
fields compared (omitted => Go zero value), maps compared on the EXPECTED
keys only unless the expected map is empty/omitted, in which case the got
map must be empty; floats compared at 6 decimal places.
"""

import pytest

from mysql_log_parser_ray.functions import parse_slow_log_text

from .conftest import read_log

MAPS = ("time_metrics", "number_metrics", "bool_metrics")
SCALARS = {
    "offset": 0,
    "ts": "",
    "admin": False,
    "query": "",
    "user": "",
    "host": "",
    "db": "",
    "rate_type": "",
    "rate_limit": 0,
}


def assert_events_match(got, expect):
    assert len(got) == len(expect), f"event count: got {len(got)}, want {len(expect)}"
    for i, (g, e) in enumerate(zip(got, expect)):
        for field, default in SCALARS.items():
            want = e.get(field, default)
            assert g[field] == want, f"event[{i}].{field}: got {g[field]!r}, want {want!r}"
        for field in MAPS:
            want = e.get(field, {})
            if not want:
                assert not g[field], f"event[{i}].{field}: got {g[field]!r}, want empty"
                continue
            for k, v in want.items():
                assert k in g[field], f"event[{i}].{field}[{k}] missing"
                gv = g[field][k]
                if isinstance(v, float) or isinstance(gv, float):
                    # Both sides are float32 in the reference (Event.TimeMetrics
                    # is map[string]float32), so round the expected literal
                    # through float32 before the 6-decimal comparison.
                    import numpy as np

                    want_f = float(np.float32(v))
                    assert f"{float(gv):.6f}" == f"{want_f:.6f}", (
                        f"event[{i}].{field}[{k}]: got {gv}, want {v}"
                    )
                else:
                    assert gv == v, f"event[{i}].{field}[{k}]: got {gv}, want {v}"


def parse(name, **kw):
    return parse_slow_log_text(read_log(name), **kw)


def test_empty(logs_dir):
    assert_events_match(parse("empty.log"), [])


def test_slow001(logs_dir):
    assert_events_match(
        parse("slow001.log"),
        [
            {
                "ts": "071015 21:43:52",
                "query": "select sleep(2) from n",
                "user": "root",
                "host": "localhost",
                "db": "test",
                "offset": 200,
                "time_metrics": {"Query_time": 2, "Lock_time": 0},
                "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
            },
            {
                "ts": "071015 21:45:10",
                "query": "select sleep(2) from test.n",
                "user": "root",
                "host": "localhost",
                "db": "sakila",
                "offset": 359,
                "time_metrics": {"Query_time": 2, "Lock_time": 0},
                "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
            },
        ],
    )


SLOW002_BOOLS = {
    "Filesort": False,
    "Full_scan": False,
    "Filesort_on_disk": False,
    "Full_join": False,
    "Tmp_table_on_disk": False,
    "Tmp_table": False,
    "QC_Hit": False,
}


def test_slow002(logs_dir):
    assert_events_match(
        parse("slow002.log"),
        [
            {
                "query": "BEGIN",
                "ts": "071218 11:48:27",
                "user": "[SQL_SLAVE]",
                "offset": 0,
                "time_metrics": {"Query_time": 0.000012, "Lock_time": 0.0},
                "number_metrics": {
                    "Merge_passes": 0,
                    "Thread_id": 10,
                    "Rows_examined": 0,
                    "Rows_sent": 0,
                },
                "bool_metrics": SLOW002_BOOLS,
            },
            {
                "db": "db1",
                "query": "update db2.tuningdetail_21_265507 n\n      inner join db1.gonzo a using(gonzo) \n      set n.column1 = a.column1, n.word3 = a.word3",
                "user": "[SQL_SLAVE]",
                "offset": 338,
                "time_metrics": {"Query_time": 0.726052, "Lock_time": 0.000091},
                "number_metrics": {
                    "Merge_passes": 0,
                    "Thread_id": 10,
                    "Rows_examined": 62951,
                    "Rows_sent": 0,
                },
                "bool_metrics": dict(SLOW002_BOOLS, Full_scan=True),
            },
            {
                "query": "INSERT INTO db3.vendor11gonzo (makef, bizzle)\nVALUES ('', 'Exact')",
                "user": "[SQL_SLAVE]",
                "offset": 815,
                "time_metrics": {
                    "InnoDB_queue_wait": 0.0,
                    "Lock_time": 0.000077,
                    "InnoDB_rec_lock_wait": 0.0,
                    "Query_time": 0.000512,
                    "InnoDB_IO_r_wait": 0.0,
                },
                "number_metrics": {
                    "InnoDB_IO_r_bytes": 0,
                    "Merge_passes": 0,
                    "InnoDB_pages_distinct": 24,
                    "Rows_sent": 0,
                    "Thread_id": 10,
                    "Rows_examined": 0,
                    "InnoDB_IO_r_ops": 0,
                },
                "bool_metrics": SLOW002_BOOLS,
            },
            {
                "query": "UPDATE db4.vab3concept1upload\nSET    vab3concept1id = '91848182522'\nWHERE  vab3concept1upload='6994465'",
                "user": "[SQL_SLAVE]",
                "offset": 1334,
                "time_metrics": {
                    "Query_time": 0.033384,
                    "InnoDB_IO_r_wait": 0.0,
                    "InnoDB_queue_wait": 0.0,
                    "Lock_time": 0.000028,
                    "InnoDB_rec_lock_wait": 0.0,
                },
                "number_metrics": {
                    "InnoDB_IO_r_bytes": 0,
                    "Merge_passes": 0,
                    "InnoDB_pages_distinct": 11,
                    "Rows_sent": 0,
                    "Thread_id": 10,
                    "Rows_examined": 0,
                    "InnoDB_IO_r_ops": 0,
                },
                "bool_metrics": SLOW002_BOOLS,
            },
            {
                "query": "INSERT INTO db1.conch (word3, vid83)\nVALUES ('211', '18')",
                "user": "[SQL_SLAVE]",
                "offset": 1864,
                "time_metrics": {
                    "InnoDB_queue_wait": 0.0,
                    "Query_time": 0.000530,
                    "InnoDB_IO_r_wait": 0.0,
                    "Lock_time": 0.000027,
                    "InnoDB_rec_lock_wait": 0.0,
                },
                "number_metrics": {
                    "InnoDB_IO_r_bytes": 0,
                    "Merge_passes": 0,
                    "InnoDB_pages_distinct": 18,
                    "Rows_sent": 0,
                    "Thread_id": 10,
                    "Rows_examined": 0,
                    "InnoDB_IO_r_ops": 0,
                },
                "bool_metrics": SLOW002_BOOLS,
            },
            {
                "query": "UPDATE foo.bar\nSET    biz = '91848182522'",
                "user": "[SQL_SLAVE]",
                "offset": 2393,
                "time_metrics": {"Lock_time": 0.000027, "Query_time": 0.000530},
                "number_metrics": {"InnoDB_pages_distinct": 18, "Thread_id": 10},
                "bool_metrics": SLOW002_BOOLS,
            },
            {
                "query": "UPDATE bizzle.bat\nSET    boop='bop: 899'\nWHERE  fillze='899'",
                "user": "[SQL_SLAVE]",
                "offset": 2861,
                "time_metrics": {"Query_time": 0.000530, "Lock_time": 0.000027},
                "number_metrics": {"InnoDB_pages_distinct": 18, "Thread_id": 10},
                "bool_metrics": SLOW002_BOOLS,
            },
            {
                "query": "UPDATE foo.bar\nSET    biz = '91848182522'",
                "user": "[SQL_SLAVE]",
                "offset": 3374,
                "time_metrics": {"Query_time": 0.000530, "Lock_time": 0.000027},
                "number_metrics": {"InnoDB_pages_distinct": 18, "Thread_id": 10},
                "bool_metrics": SLOW002_BOOLS,
            },
        ],
    )


def test_slow003(logs_dir):
    assert_events_match(
        parse("slow003.log"),
        [
            {
                "query": "BEGIN",
                "ts": "071218 11:48:27",
                "user": "[SQL_SLAVE]",
                "offset": 2,
                "bool_metrics": SLOW002_BOOLS,
                "time_metrics": {"Lock_time": 0.0, "Query_time": 0.000012},
                "number_metrics": {
                    "Merge_passes": 0,
                    "Rows_examined": 0,
                    "Rows_sent": 0,
                    "Thread_id": 10,
                },
            }
        ],
    )


def test_slow004(logs_dir):
    assert_events_match(
        parse("slow004.log"),
        [
            {
                "query": "select 12_13_foo from (select 12foo from 123_bar) as 123baz",
                "host": "localhost",
                "ts": "071015 21:43:52",
                "user": "root",
                "offset": 200,
                "time_metrics": {"Lock_time": 0.0, "Query_time": 2.0},
                "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
            }
        ],
    )


def test_slow005(logs_dir):
    assert_events_match(
        parse("slow005.log"),
        [
            {
                "query": "foo\nbar\n\t\t\t0 AS counter\nbaz",
                "ts": "071218 11:48:27",
                "user": "[SQL_SLAVE]",
                "offset": 0,
                "bool_metrics": SLOW002_BOOLS,
                "time_metrics": {"Query_time": 0.000012, "Lock_time": 0.0},
                "number_metrics": {
                    "Merge_passes": 0,
                    "Rows_examined": 0,
                    "Rows_sent": 0,
                    "Thread_id": 10,
                },
            }
        ],
    )


def test_slow006(logs_dir):
    base = {
        "user": "[SQL_SLAVE]",
        "bool_metrics": SLOW002_BOOLS,
        "time_metrics": {"Query_time": 0.000012, "Lock_time": 0.0},
    }
    nm = {"Merge_passes": 0, "Rows_examined": 0, "Rows_sent": 0}
    assert_events_match(
        parse("slow006.log"),
        [
            dict(base, query="SELECT col FROM foo_tbl", db="foo", ts="071218 11:48:27",
                 offset=0, number_metrics=dict(nm, Thread_id=10)),
            dict(base, query="SELECT col FROM foo_tbl", db="foo", ts="071218 11:48:57",
                 offset=369, number_metrics=dict(nm, Thread_id=10)),
            dict(base, query="SELECT col FROM bar_tbl", db="bar", ts="071218 11:48:57",
                 offset=737, number_metrics=dict(nm, Thread_id=20)),
            dict(base, query="SELECT col FROM bar_tbl", db="bar", ts="071218 11:49:05",
                 offset=1101, number_metrics=dict(nm, Thread_id=10)),
            dict(base, query="SELECT col FROM bar_tbl", db="bar", ts="071218 11:49:07",
                 offset=1469, number_metrics=dict(nm, Thread_id=20)),
            dict(base, query="SELECT col FROM foo_tbl", db="foo", ts="071218 11:49:30",
                 offset=1833, number_metrics=dict(nm, Thread_id=30)),
        ],
    )


def test_slow007(logs_dir):
    # Schema: db1 AND use db2; => db2 wins (slow.go:245-251 vs 210-211).
    assert_events_match(
        parse("slow007.log"),
        [
            {
                "query": "SELECT fruit FROM trees",
                "db": "db2",
                "ts": "071218 11:48:27",
                "user": "[SQL_SLAVE]",
                "offset": 0,
                "time_metrics": {"Query_time": 0.000012, "Lock_time": 0.0},
                "number_metrics": {"Rows_examined": 0, "Rows_sent": 0, "Thread_id": 3},
            }
        ],
    )


def test_slow008(logs_dir):
    assert_events_match(
        parse("slow008.log"),
        [
            {
                "query": "Quit",
                "db": "db1",
                "admin": True,
                "user": "meow",
                "offset": 0,
                "time_metrics": {"Query_time": 0.000002, "Lock_time": 0.0},
                "number_metrics": {"Rows_examined": 0, "Rows_sent": 0, "Thread_id": 5},
            },
            {
                "query": "SET NAMES utf8",
                "db": "db",
                "user": "meow",
                "offset": 221,
                "time_metrics": {"Query_time": 0.000899, "Lock_time": 0.0},
                "number_metrics": {"Rows_examined": 0, "Rows_sent": 0, "Thread_id": 6},
            },
            {
                "query": "SELECT MIN(id),MAX(id) FROM tbl",
                "db": "db2",
                "user": "meow",
                "offset": 435,
                "time_metrics": {"Query_time": 0.018799, "Lock_time": 0.009453},
                "number_metrics": {"Rows_examined": 0, "Rows_sent": 0, "Thread_id": 6},
            },
        ],
    )


def test_slow009_filter_admin(logs_dir):
    got = parse("slow009.log", filter_admin_command=frozenset({"Quit"}))
    assert_events_match(
        got,
        [
            {
                "query": "Refresh",
                "admin": True,
                "host": "localhost",
                "user": "root",
                "offset": 197,
                "ts": "090311 18:11:50",
                "time_metrics": {"Query_time": 0.017850, "Lock_time": 0.0},
                "number_metrics": {"Rows_examined": 0, "Rows_sent": 0, "Thread_id": 47},
                "bool_metrics": SLOW002_BOOLS,
            }
        ],
    )


def test_slow011_rate_limit(logs_dir):
    base = {
        "db": "maindb",
        "host": "localhost",
        "user": "user1",
        "rate_type": "query",
        "rate_limit": 2,
        "bool_metrics": SLOW002_BOOLS,
    }
    nm = {
        "Rows_affected": 0,
        "Bytes_sent": 545,
        "Tmp_tables": 0,
        "Tmp_disk_tables": 0,
        "Tmp_table_sizes": 0,
        "Merge_passes": 0,
        "InnoDB_IO_r_ops": 0,
        "InnoDB_IO_r_bytes": 0,
        "InnoDB_pages_distinct": 2,
        "Rows_sent": 1,
        "Rows_examined": 1,
    }
    tm = {
        "InnoDB_IO_r_wait": 0.0,
        "InnoDB_rec_lock_wait": 0.0,
        "InnoDB_queue_wait": 0.0,
    }
    assert_events_match(
        parse("slow011.log"),
        [
            dict(base, offset=0, query="SELECT foo FROM bar WHERE id=1",
                 ts="131128  1:05:31",
                 time_metrics=dict(tm, Query_time=0.000228, Lock_time=0.000114),
                 number_metrics=nm),
            dict(base, offset=733, query="SELECT foo FROM bar WHERE id=2",
                 time_metrics=dict(tm, Query_time=0.000237, Lock_time=0.000122),
                 number_metrics=nm),
            dict(base, offset=1441, query="INSERT INTO foo VALUES (NULL, 3)",
                 time_metrics=dict(tm, Query_time=0.000165, Lock_time=0.000048),
                 number_metrics=dict(nm, Rows_sent=5, Rows_examined=10,
                                     Bytes_sent=481, InnoDB_pages_distinct=3),
                 bool_metrics=dict(SLOW002_BOOLS, Filesort=True)),
        ],
    )


def test_slow012(logs_dir):
    assert_events_match(
        parse("slow012.log"),
        [
            {
                "query": "select * from mysql.user",
                "host": "localhost",
                "user": "msandbox",
                "offset": 0,
                "time_metrics": {"Query_time": 0.000214, "Lock_time": 0.000086},
                "number_metrics": {"Rows_sent": 2, "Rows_examined": 2},
            },
            {
                "query": "Quit",
                "admin": True,
                "host": "localhost",
                "user": "msandbox",
                "offset": 186,
                "time_metrics": {"Query_time": 0.000016, "Lock_time": 0.0},
                "number_metrics": {"Rows_sent": 2, "Rows_examined": 2},
            },
            {
                "query": "SELECT @@max_allowed_packet",
                "db": "dev_pct",
                "host": "localhost",
                "user": "msandbox",
                "offset": 376,
                "ts": "140413 19:34:13",
                "time_metrics": {"Query_time": 0.000127, "Lock_time": 0.0},
                "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
            },
        ],
    )


def test_slow013_meta_lines(logs_dir):
    base = {"user": "root", "host": "localhost"}
    assert_events_match(
        parse("slow013.log"),
        [
            dict(base, offset=0, ts="140224 22:39:34", db="db950",
                 query="select 950,q.* from qcm q INTO OUTFILE '/mnt/pct/exp/qcm_db950.txt'",
                 time_metrics={"Query_time": 21.876617, "Lock_time": 0.002991},
                 number_metrics={"Bytes_sent": 14, "Killed": 0, "Last_errno": 0,
                                 "Rows_affected": 1605306, "Rows_examined": 1605306,
                                 "Rows_sent": 1605306}),
            dict(base, offset=354, ts="140224 22:39:59", db="db961",
                 query="select 961,q.* from qcm q INTO OUTFILE '/mnt/pct/exp/qcm_db961.txt'",
                 time_metrics={"Query_time": 20.304537, "Lock_time": 0.103324},
                 number_metrics={"Bytes_sent": 14, "Rows_affected": 1197472,
                                 "Rows_examined": 1197472, "Rows_sent": 1197472}),
            dict(offset=6139, ts="140311 16:07:40", user="debian-sys-maint",
                 host="localhost", db="",
                 query="select count(*) into @discard from `information_schema`.`PARTITIONS`",
                 time_metrics={"Query_time": 94.38144, "Lock_time": 0.000174},
                 number_metrics={"Bytes_sent": 11, "Last_errno": 1146,
                                 "Rows_affected": 1, "Rows_examined": 17799,
                                 "Rows_sent": 0}),
            dict(base, offset=6667, ts="140312 20:28:40", db="db1",
                 query="select 1,q.* from qcm q INTO OUTFILE '/mnt/pct/exp/qcm_db1.txt'",
                 time_metrics={"Query_time": 407.54025, "Lock_time": 0.122377},
                 number_metrics={"Bytes_sent": 19, "Rows_affected": 34621308,
                                 "Rows_examined": 34621308, "Rows_sent": 34621308}),
            dict(base, offset=7015, ts="140312 20:29:40", db="db1006",
                 query="select 1006,q.* from qcm q INTO OUTFILE '/mnt/pct/exp/qcm_db1006.txt'",
                 time_metrics={"Query_time": 60.507698, "Lock_time": 0.002719},
                 number_metrics={"Bytes_sent": 14, "Rows_affected": 4937738,
                                 "Rows_examined": 4937738, "Rows_sent": 4937738}),
        ],
    )


SLOW014_BOOLS = {
    "Filesort": False,
    "Filesort_on_disk": False,
    "Full_join": False,
    "Full_scan": False,
    "QC_Hit": False,
    "Tmp_table": False,
    "Tmp_table_on_disk": False,
}


def test_slow014_header_lookalike_query(logs_dir):
    base = {"user": "root", "host": "localhost", "db": "db1"}
    tm = {"InnoDB_IO_r_wait": 0.0, "InnoDB_queue_wait": 0.0, "InnoDB_rec_lock_wait": 0.0}
    nm = {
        "InnoDB_IO_r_bytes": 0,
        "InnoDB_IO_r_ops": 0,
        "InnoDB_trx_id": 0,
        "Killed": 0,
        "Last_errno": 0,
        "Merge_passes": 0,
        "Rows_affected": 0,
        "Thread_id": 103375137,
        "Tmp_disk_tables": 0,
        "Tmp_table_sizes": 0,
    }
    assert_events_match(
        parse("slow014.log"),
        [
            dict(base, offset=0,
                 query="SELECT * FROM cache\n WHERE `cacheid` IN ('id15965')",
                 time_metrics=dict(tm, Lock_time=4.7e-05, Query_time=0.000179),
                 number_metrics=dict(nm, Bytes_sent=2004, InnoDB_pages_distinct=3,
                                     Rows_examined=1, Rows_read=1, Rows_sent=1,
                                     Tmp_tables=0),
                 bool_metrics=SLOW014_BOOLS),
            dict(base, offset=691,
                 query="### Channels ###\n\t\t\t\t\tSELECT sourcetable, IF(f.lastcontent = 0, f.lastupdate, f.lastcontent) AS lastactivity,\n\t\t\t\t\tf.totalcount AS activity, type.class AS type,\n\t\t\t\t\t(f.nodeoptions & 512) AS noUnsubscribe\n\t\t\t\t\tFROM node AS f\n\t\t\t\t\tINNER JOIN contenttype AS type ON type.contenttypeid = f.contenttypeid \n\n\t\t\t\t\tINNER JOIN subscribed AS sd ON sd.did = f.nodeid AND sd.userid = 15965\n UNION  ALL \n\n\t\t\t\t\t### Users ###\n\t\t\t\t\tSELECT f.name AS title, f.userid AS keyval, 'user' AS sourcetable, IFNULL(f.lastpost, f.joindate) AS lastactivity,\n\t\t\t\t\tf.posts as activity, 'Member' AS type,\n\t\t\t\t\t0 AS noUnsubscribe\n\t\t\t\t\tFROM user AS f\n\t\t\t\t\tINNER JOIN userlist AS ul ON ul.relationid = f.userid AND ul.userid = 15965\n\t\t\t\t\tWHERE ul.type = 'f' AND ul.aq = 'yes'\n ORDER BY title ASC LIMIT 100",
                 time_metrics=dict(tm, Lock_time=0.000161, Query_time=0.000628),
                 number_metrics=dict(nm, Bytes_sent=323, InnoDB_pages_distinct=3,
                                     Rows_examined=0, Rows_read=0, Rows_sent=0,
                                     Tmp_tables=1),
                 bool_metrics=dict(SLOW014_BOOLS, Filesort=True, Full_scan=True,
                                   Tmp_table=True)),
            dict(base, offset=2105,
                 query="SELECT COUNT(userfing.keyval) AS total\n\t\t\tFROM\n\t\t\t((### All Content ###\n\t\t\t\t\tSELECT f.nodeid AS keyval\n\t\t\t\t\tFROM node AS f\n\t\t\t\t\tINNER JOIN subscribed AS sd ON sd.did = f.nodeid AND sd.userid = 15965) UNION ALL (\n\t\t\t\t\t### Users ###\n\t\t\t\t\tSELECT f.userid AS keyval\n\t\t\t\t\tFROM user AS f\n\t\t\t\t\tINNER JOIN userlist AS ul ON ul.relationid = f.userid AND ul.userid = 15965\n\t\t\t\t\tWHERE ul.type = 'f' AND ul.aq = 'yes')\n) AS userfing",
                 time_metrics=dict(tm, Lock_time=0.000116, Query_time=0.00042),
                 number_metrics=dict(nm, Bytes_sent=60, InnoDB_pages_distinct=3,
                                     Rows_examined=0, Rows_read=0, Rows_sent=1,
                                     Tmp_tables=2),
                 bool_metrics=dict(SLOW014_BOOLS, Full_scan=True, Tmp_table=True)),
            dict(base, offset=3164,
                 query="SELECT u.userid, u.name AS name, u.usergroupid AS usergroupid, IFNULL(u.lastactivity, u.joindate) as lastactivity,\n\t\t\t\tIFNULL((SELECT userid FROM userlist AS ul2 WHERE ul2.userid = 15965 AND ul2.relationid = u.userid AND ul2.type = 'f' AND ul2.aq = 'yes'), 0) as isFollowing,\n\t\t\t\tIFNULL((SELECT userid FROM userlist AS ul2 WHERE ul2.userid = 15965 AND ul2.relationid = u.userid AND ul2.type = 'f' AND ul2.aq = 'pending'), 0) as isPending\nFROM user AS u\n\t\t\t\tINNER JOIN userlist AS ul ON (u.userid = ul.userid AND ul.relationid = 15965)\n\n\t\t\tWHERE ul.type = 'f' AND ul.aq = 'yes'\nORDER BY name ASC\nLIMIT 0, 100",
                 time_metrics=dict(tm, Lock_time=0.000144, Query_time=0.000457),
                 number_metrics=dict(nm, Bytes_sent=359, InnoDB_pages_distinct=1,
                                     Rows_examined=0, Rows_read=0, Rows_sent=0,
                                     Tmp_tables=1),
                 bool_metrics=dict(SLOW014_BOOLS, Filesort=True, Tmp_table=True)),
        ],
    )


def test_slow001_start_offset(logs_dir):
    # Resume at byte 359: first partial line skipped, no Ts (the Time line is
    # cut), offset reflects the reference's accounting (parser_test.go:1255-1280).
    got = parse("slow001.log", start_offset=359)
    assert_events_match(
        got,
        [
            {
                "query": "select sleep(2) from test.n",
                "user": "root",
                "host": "localhost",
                "db": "sakila",
                "offset": 383,
                "time_metrics": {"Query_time": 2, "Lock_time": 0},
                "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
            }
        ],
    )


def test_slow015_long_line(logs_dir):
    # >64KiB single-line query; count-only golden (parser_test.go:1284-1287).
    assert len(parse("slow015.log")) == 2


def test_slow016_start_in_header(logs_dir):
    got = parse("slow016.log")
    assert_events_match(
        got,
        [
            {
                "query": "SHOW /*!50002 GLOBAL */ STATUS",
                "user": "pt_agent",
                "host": "localhost",
                "offset": 160,
                "time_metrics": {"Query_time": 0.003953, "Lock_time": 0.000059},
                "number_metrics": {"Rows_sent": 571, "Rows_examined": 571,
                                   "Rows_affected": 0},
            }
        ],
    )


def test_slow017_start_in_query(logs_dir):
    got = parse("slow017.log")
    assert_events_match(
        got,
        [
            {
                "query": "SHOW /*!50002 GLOBAL */ STATUS",
                "user": "pt_agent",
                "host": "localhost",
                "offset": 27,
                "time_metrics": {"Query_time": 0.003953, "Lock_time": 0.000059},
                "number_metrics": {"Rows_sent": 571, "Rows_examined": 571,
                                   "Rows_affected": 0},
            }
        ],
    )


def test_fast_path_equivalence(logs_dir):
    """Differential: the single-event fast path must be bit-identical to the
    state machine on every doc it accepts - over all reference fixtures AND
    a synthetic corpus with multi-event/admin/banner docs."""
    import glob
    import os

    from mysql_log_parser_ray.functions.slowlog import (
        SlowLogDocParser,
        _parse_fast,
    )
    from mysql_log_parser_ray.sources.synth import generate_corpus
    from mysql_log_parser_ray.sources.sequences import detokenize_column

    texts = []
    for path in sorted(glob.glob(os.path.join(logs_dir, "*.log"))):
        with open(path, "rb") as f:
            texts.append(f.read())
    corpus = generate_corpus(2000, seed=11, n_sources=8)
    texts += [bytes(t) for t in detokenize_column(corpus["tokens"])]
    # adversarial shapes for the fast-path guards
    texts += [
        b"# Query_time: 1.0\nUPDATE t SET timestamp=5;\n",   # unanchored setRe skip
        b"# Query_time: 1.0\nSET insert_id=3;\n",            # only-line-is-SET
        b"# Time: 071218 11:48:27\n# Query_time: 1.0\nTcp port: 3306 blah blah with:\n",
        b"# User@Host: [wrapped] @ h []\n# Query_time: 2.0\nSELECT 1;\n",
        b"# Query_time: 1.0  Lock_time: \nSELECT 2;\n",      # empty metric value
        b"# Schema: sdb\n# Query_time: 1.0\nuse udb;\nSELECT 3;\n",  # use wins
        b"# Query_time: 1.0\nuse udb;;\nSELECT 4;;\n",       # rstrip parity
    ]

    from mysql_log_parser_ray.functions.slowlog import parse_slow_log_text

    n_fast = 0
    for t in texts:
        slow = SlowLogDocParser().run(t, 0)
        fast = _parse_fast(t.decode("utf-8", errors="replace"))
        if fast is not None:
            n_fast += 1
            assert fast == slow, f"fast-path divergence on: {t[:120]!r}"
        # the DISPATCHER (fast -> multi-event fast -> state machine) must
        # equal the state machine on EVERY doc, whatever path it took
        # (`slow` above already succeeded, so the dispatcher must too)
        dispatched = parse_slow_log_text(t)
        assert dispatched == slow, f"dispatcher divergence on: {t[:120]!r}"
    # the fast path must actually engage on the common corpus shape
    assert n_fast > 1500


def test_fast_path_rejects_bad_format_time_lines():
    """Regression (code review): a Percona bad-format Time line (user on
    the Time line), repeated Time lines, or a non-two-token stamp must NOT
    be absorbed as a 'Time' metric by the fast path - state machine wins."""
    from mysql_log_parser_ray.functions.slowlog import (
        SlowLogDocParser,
        _parse_fast,
        parse_slow_log_text,
    )

    bad = (
        "# Time: 071218 11:48:27 # User@Host: bob[bob] @ localhost []\n"
        "# Query_time: 1.0\n"
        "SELECT 1;\n"
    )
    assert _parse_fast(bad) is None  # falls back
    evs = parse_slow_log_text(bad)
    assert evs[0]["ts"] == "071218 11:48:27"
    assert evs[0]["user"] == "bob"
    assert evs[0]["host"] == "localhost"
    assert "Time" not in evs[0]["number_metrics"]

    repeated = (
        "# Time: 071218 11:48:27\n# Time: 071219 12:00:00\n"
        "# Query_time: 1.0\nSELECT 1;\n"
    )
    assert _parse_fast(repeated) is None
    assert parse_slow_log_text(repeated)[0]["ts"] == "071219 12:00:00"


def test_parse_uint_go_semantics():
    """Regression (code review): Go strconv.ParseUint parity - overflow
    keeps the clamped MaxUint64 (err ignored at slow.go:215,219); unicode
    digits are a syntax error yielding 0, not a crash."""
    from mysql_log_parser_ray.functions.slowlog import (
        _UINT64_MAX,
        parse_slow_log_text,
    )

    doc = (
        "# Query_time: 1.0\n"
        "# Bytes_sent: 99999999999999999999999  Rows_sent: ²  Thread_id: 7\n"
        "SELECT 1;\n"
    )
    evs = parse_slow_log_text(doc)
    nm = evs[0]["number_metrics"]
    assert nm["Bytes_sent"] == _UINT64_MAX  # overflow -> clamped, kept
    assert nm["Rows_sent"] == 0             # unicode digit -> syntax err -> 0
    assert nm["Thread_id"] == 7


def test_debug_trace_slow001(logs_dir):
    """Options.Debug parity (options.go:7, slow.go:102-292): per-line state
    traces with the reference's labels, same events as the silent parse."""
    trace = []
    got = parse("slow001.log", debug=True, debug_sink=trace.append)
    assert got == parse("slow001.log")  # tracing must not change results
    labels = [t for t in trace if not t.startswith("+")]
    line_traces = [t for t in trace if t.startswith("+")]
    # slow001 has two events: User@Host headers, metric lines, one query each
    assert labels.count("header") >= 2
    assert labels.count("user") >= 2
    assert labels.count("metrics") >= 2
    assert labels.count("send event") == 2
    assert labels.count("query") >= 2
    assert labels[-1] == "done"
    # every line of the doc is traced with its byte offset
    assert line_traces[0].startswith("+0 line: ")
    n_lines = read_log("slow001.log").count(b"\n")
    assert len(line_traces) == n_lines


def test_debug_forces_state_machine_same_result(logs_dir):
    """debug=True must bypass the fast path yet stay bit-identical."""
    for name in ("slow002.log", "slow009.log", "slow013.log"):
        assert parse(name, debug=True, debug_sink=lambda _: None) == parse(name)
