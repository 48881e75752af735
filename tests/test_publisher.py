"""Publisher event-stream tests — START/END per fetch-log row, REPORT
per parse row with outlinks JSON, status-name mapping
(fetcher/FetcherThread.java:296-299,370-373,786-796)."""

from coherencebot_spark.operators.publisher import fetcher_events
from coherencebot_spark.status import Fetch


def test_start_end_events(spark):
    fl = spark.createDataFrame(
        [("u1", int(Fetch.SUCCESS), 1000), ("u2", int(Fetch.GONE), 2000)],
        "url string, status int, fetch_time long")
    ev = fetcher_events(fl).collect()
    by = {(r["event_type"], r["url"]): r for r in ev}
    assert len(ev) == 4
    assert by[("START", "u1")]["event_data"] == {}
    assert by[("END", "u1")]["event_data"] == {"status": "fetch_success"}
    assert by[("END", "u2")]["event_data"] == {"status": "fetch_gone"}
    assert by[("END", "u2")]["timestamp"] == 2000


def test_report_events_with_outlinks(spark):
    fl = spark.createDataFrame([("u1", int(Fetch.SUCCESS), 1000)],
                               "url string, status int, fetch_time long")
    pr = spark.createDataFrame(
        [("u1", 1000, "A Title", "text/html", 0.5, None,
          [("http://t/1", "one")])],
        "url string, fetch_time long, title string, content_type string, "
        "score double, lang string, "
        "outlinks array<struct<url:string,anchor:string>>")
    ev = {(r["event_type"], r["url"]): r
          for r in fetcher_events(fl, pr).collect()}
    rep = ev[("REPORT", "u1")]["event_data"]
    assert rep["title"] == "A Title"
    assert rep["contentType"] == "text/html"
    assert rep["score"] == "0.5"
    assert rep["fetchTime"] == "1000"
    assert "lang" not in str(rep.get("contentLanguage"))  # null dropped
    assert "contentLanguage" not in rep
    assert '"url":"http://t/1"' in rep["outlinks"].replace(" ", "")
    assert len(ev) == 3  # START + END + REPORT
