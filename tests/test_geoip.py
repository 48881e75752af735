"""index-geoip + store.ip.address tests (GeoIPIndexingFilter.java:118-233,
GeoIPDocumentCreator.java:85-232, net/protocols/Response.java:40-42)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators import indexing as ix
from coherencebot_spark.operators.fetch import fetch, server_ip_expr
from coherencebot_spark.schemas import FETCHLIST
from coherencebot_spark.status import Db

from test_fetch import all_success_backend, fldf, flrow, open_robots

T = 1_700_000_000_000


# --------------------------------------------------------- store.ip.address


def test_store_ip_address_records_deterministic_ip(spark):
    rows = [flrow(f"http://h{i % 3}.org/p{i}", f"h{i % 3}.org", sort_key=i)
            for i in range(9)]
    cfg = DEFAULT.with_(store_ip_address=True)
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=all_success_backend,
                   robots_provider=open_robots)
    got = {r["host"]: r["ips"] for r in
           log.groupBy("host")
              .agg(F.collect_set(F.col("metadata")["_ip_"]).alias("ips"))
              .collect()}
    assert set(got) == {"h0.org", "h1.org", "h2.org"}
    for host, ips in got.items():
        assert len(ips) == 1, f"{host}: ip must be stable per host"
        assert re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", ips[0])
        o1 = int(ips[0].split(".")[0])
        assert 1 <= o1 <= 223  # unicast space


def test_store_ip_address_off_by_default(spark):
    rows = [flrow("http://h0.org/p0", "h0.org")]
    log, _ = fetch(fldf(spark, rows), T, DEFAULT,
                   backend=all_success_backend, robots_provider=open_robots)
    row = log.select(F.col("metadata")["_ip_"].alias("ip")).first()
    assert row["ip"] is None


def test_injected_ip_expr_overrides_synthetic(spark):
    rows = [flrow("http://h0.org/p0", "h0.org")]
    cfg = DEFAULT.with_(store_ip_address=True)
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=all_success_backend,
                   robots_provider=open_robots,
                   ip_expr=lambda host: F.lit("203.0.113.7"))
    assert log.select(F.col("metadata")["_ip_"].alias("ip")).first()["ip"] \
        == "203.0.113.7"


# ------------------------------------------------------------- geoip_filter


def _geodb(spark):
    # one row per ip; 10.0.0.2 deliberately carries null city fields
    # (addIfNotNull parity: null attribute -> null column)
    return spark.createDataFrame(
        [("10.0.0.1", "Minneapolis", 50, "NA", "US", "United States",
          44.5, -93.5, "America/Chicago", "55455", "Minnesota", "MN",
          1234, "AS-ORG", "isp-a", "org-a", "example.com", "cable"),
         ("10.0.0.2", None, None, "EU", "FR", None,
          None, None, None, None, None, None,
          None, None, None, None, None, None)],
        "ip string, cityName string, cityConfidence int, "
        "continentCode string, countryIsoCode string, countryName string, "
        "latitude double, longitude double, timeZone string, "
        "postalCode string, subDivName string, subDivIdoCode string, "
        "autonSystemNum long, autonSystemOrg string, isp string, "
        "org string, domain string, connType string")


def _docs(spark):
    return spark.createDataFrame(
        [("http://a.org/1", {"_ip_": "10.0.0.1"}),
         ("http://b.org/2", {"_ip_": "10.0.0.2"}),
         ("http://c.org/3", {"_ip_": "192.0.2.9"}),   # not in the db
         ("http://d.org/4", None)],                   # no ip stored
        "url string, metadata map<string,string>")


def test_geoip_city_fields(spark):
    out = {r["url"]: r for r in
           ix.geoip_filter(_geodb(spark), "cityDatabase")(_docs(spark))
           .collect()}
    a = out["http://a.org/1"]
    assert a["ip"] == "10.0.0.1"
    assert a["cityName"] == "Minneapolis"
    assert a["cityConfidence"] == 50
    assert a["countryIsoCode"] == "US"
    assert a["latLon"] == "44.5,-93.5"
    assert a["timeZone"] == "America/Chicago"
    assert a["subDivIdoCode"] == "MN"  # reference field-name parity
    # columns absent from the injected export stay null
    assert a["metroCode"] is None
    b = out["http://b.org/2"]
    assert b["continentCode"] == "EU" and b["cityName"] is None
    assert b["latLon"] is None  # only with both coordinates
    # AddressNotFoundException path: doc passes through unenriched
    c = out["http://c.org/3"]
    assert c["ip"] == "192.0.2.9" and c["cityName"] is None
    assert out["http://d.org/4"]["ip"] is None


def test_geoip_usage_field_sets(spark):
    geodb, docs = _geodb(spark), _docs(spark)
    isp = ix.geoip_filter(geodb, "ispDatabase")(docs)
    assert {"autonSystemNum", "autonSystemOrg", "isp", "org"} \
        <= set(isp.columns)
    assert "cityName" not in isp.columns
    r = {x["url"]: x for x in isp.collect()}["http://a.org/1"]
    assert r["autonSystemNum"] == 1234 and r["isp"] == "isp-a"

    dom = ix.geoip_filter(geodb, "domainDatabase")(docs)
    assert "domain" in dom.columns and "isp" not in dom.columns

    conn = {x["url"]: x for x in
            ix.geoip_filter(geodb, "connectionTypeDatabase")(docs).collect()}
    assert conn["http://a.org/1"]["connType"] == "cable"

    ins = ix.geoip_filter(geodb, "insightsService")(docs)
    assert {"cityName", "latLon", "isp", "userType", "isAnonProxy"} \
        <= set(ins.columns)

    with pytest.raises(ValueError, match="index.geoip.usage"):
        ix.geoip_filter(geodb, "countryDatabase")


def test_geoip_explicit_ip_col(spark):
    docs = spark.createDataFrame([("u1", "10.0.0.1")],
                                 "url string, server_ip string")
    out = ix.geoip_filter(_geodb(spark), "domainDatabase",
                          ip_col="server_ip")(docs).first()
    assert out["domain"] == "example.com"


# ------------------------------------------------------- WARC-IP-Address


def test_warc_ip_address_header(spark, tmp_path):
    from coherencebot_spark.sources.sinks import (dump_segment_warc,
                                                  read_warc_records)

    rows = [flrow("http://h0.org/p0", "h0.org")]
    cfg = DEFAULT.with_(store_ip_address=True)
    log, content = fetch(fldf(spark, rows), T, cfg,
                         backend=all_success_backend,
                         robots_provider=open_robots)
    ip = log.select(F.col("metadata")["_ip_"].alias("ip")).first()["ip"]
    dump_segment_warc(log, content, str(tmp_path / "warc"))
    res = [r for r in read_warc_records(str(tmp_path / "warc"))
           if r["type"] == "resource"]
    assert res and all(r.get("WARC-IP-Address") == ip for r in res)


def test_geoip_field_name_collision(spark):
    # index-basic already added `domain`; geoip's domain lands on
    # geoip_domain so both survive (reference: one multi-valued field)
    docs = spark.createDataFrame(
        [("u1", "a.org", "10.0.0.1")],
        "url string, domain string, server_ip string")
    out = ix.geoip_filter(_geodb(spark), "domainDatabase",
                          ip_col="server_ip")(docs).first()
    assert out["domain"] == "a.org"
    assert out["geoip_domain"] == "example.com"
