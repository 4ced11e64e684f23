"""GDELT / T-Drive / GeoLife delimited ingest plugins: typed parse,
malformed-line dropping, and the no-Python-in-plan contract."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.sources import ingest_formats as ing


def _gdelt_line(eid, date, lat, lon, ncols=57, url=None):
    vals = [""] * (58 if url is not None else ncols)
    vals[0] = str(eid)
    vals[1] = date
    vals[6] = "GOVERNMENT"
    vals[16] = "POLICE"
    vals[31] = "4"
    vals[32] = "2"
    vals[33] = "4"
    vals[34] = "-1.5"
    vals[51] = "US"
    vals[53] = str(lat)
    vals[54] = str(lon)
    if url is not None:
        vals[57] = url
    return "\t".join(vals)


def test_read_gdelt(spark, tmp_path):
    p = tmp_path / "ev.tsv"
    p.write_text(
        "\n".join(
            [
                _gdelt_line(1, "20130401", 38.9, -77.0),
                _gdelt_line(2, "20130402", -33.8, 151.2, url="http://example.com/a"),
                _gdelt_line(3, "20130403", "", ""),  # no geocode -> skipped
                "short\tline",  # under 57 cols -> skipped
            ]
        )
    )
    df = ing.read_gdelt(spark, str(p)).orderBy("event_id")
    rows = df.collect()
    assert [r["event_id"] for r in rows] == [1, 2]
    r0, r1 = rows
    assert str(r0["event_date"]) == "2013-04-01"
    assert r0["actor1"] == "GOVERNMENT" and r0["actor2"] == "POLICE"
    assert (r0["lat"], r0["lon"]) == (38.9, -77.0)
    assert r0["num_mentions"] == 4 and abs(r0["avg_tone"] + 1.5) < 1e-12
    assert r0["source_url"] is None and r1["source_url"] == "http://example.com/a"
    assert r0["country_code"] == "US"
    # pure-JVM parse: no Python eval anywhere in the plan
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()


def test_read_tdrive(spark, tmp_path):
    p = tmp_path / "taxi_42.txt"
    p.write_text(
        "\n".join(
            [
                "42,2008-02-02 15:36:08,116.51172,39.92123",
                "42,2008-02-02 15:46:08,116.51135,39.93883",
                "42,bad-line",  # 2 fields -> dropped
                "42,not-a-date,116.5,39.9",  # unparseable ts -> dropped
            ]
        )
    )
    df = ing.read_tdrive(spark, str(p)).orderBy("ts")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["taxi_id"] == 42
    assert rows[0]["lon"] == 116.51172 and rows[0]["lat"] == 39.92123
    assert rows[0]["ts"].minute == 36
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()


def test_read_geolife(spark, tmp_path):
    d = tmp_path / "000" / "Trajectory"
    d.mkdir(parents=True)
    p = d / "20081023025304.plt"
    p.write_text(
        "\n".join(
            [
                "Geolife trajectory",
                "WGS 84",
                "Altitude is in Feet",
                "Reserved 3",
                "0,2,255,My Track,0,0,2,8421376",
                "0",
                "39.984702,116.318417,0,492,39744.1201851852,2008-10-23,02:53:04",
                "39.984683,116.31845,0,492,39744.1202546296,2008-10-23,02:53:10",
            ]
        )
    )
    df = ing.read_geolife(spark, str(p)).orderBy("ts")
    rows = df.collect()
    assert len(rows) == 2  # all 6 header lines dropped
    assert rows[0]["lat"] == 39.984702 and rows[0]["lon"] == 116.318417
    assert rows[0]["alt_feet"] == 492.0
    assert rows[0]["ts"].second == 4
    assert rows[0]["trajectory_id"] == "000/20081023025304"
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()


def test_read_twitter(spark, tmp_path):
    import gzip
    import json as _json

    def tweet(tid, lon=None, lat=None, **over):
        t = {
            "id_str": str(tid),
            "created_at": "Wed Aug 27 13:08:45 +0000 2008",
            "text": f"tweet {tid}",
            "lang": "en",
            "retweet_count": 3,
            "in_reply_to_user_id_str": None,
            "in_reply_to_status_id_str": None,
            "coordinates": (
                {"coordinates": [lon, lat], "type": "Point"}
                if lon is not None
                else None
            ),
            "user": {"id_str": f"u{tid}", "name": f"user {tid}"},
        }
        t.update(over)
        return _json.dumps(t)

    p = tmp_path / "tweets.json.gz"
    lines = [
        tweet(1, -77.03, 38.9),
        tweet(2, 151.2, -33.8, lang=None, retweet_count=None),
        tweet(3),  # not geotagged -> skipped (TwitterIngestPlugin only ingests geo)
        "{not json at all",  # malformed -> skipped
        tweet(4, 2.35, 48.85, in_reply_to_user_id_str="u1",
              in_reply_to_status_id_str="1"),
    ]
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines))

    df = ing.read_twitter(spark, str(p)).orderBy("tweet_id")
    rows = df.collect()
    assert [r["tweet_id"] for r in rows] == ["1", "2", "4"]
    r1, r2, r4 = rows
    assert (r1["lon"], r1["lat"]) == (-77.03, 38.9)
    assert r1["user_id"] == "u1" and r1["user_name"] == "user 1"
    assert r1["retweet_count"] == 3 and r1["lang"] == "en"
    assert str(r1["dtg"]).startswith("2008-08-27")
    assert r1["wkt"] == "POINT (-77.03 38.9)"
    # nullable attrs survive as NULL / default-0 (reference inits retweetCount=0)
    assert r2["lang"] is None and r2["retweet_count"] == 0
    assert r4["in_reply_to_user_id"] == "u1" and r4["in_reply_to_status_id"] == "1"
    # pure-JVM parse: no Python eval anywhere in the plan
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()
