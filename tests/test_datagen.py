import numpy as np
import pandas as pd

from openlogreplicator_spark.datagen import GenSpec, generate_events
from openlogreplicator_spark.functions.extract import extract_text
from openlogreplicator_spark.replayer import replay


def test_deterministic_bytes():
    spec = GenSpec(seed=42, n_events=500, n_urls=60, n_files=2)
    t1 = generate_events(spec)
    t2 = generate_events(spec)
    assert t1.equals(t2)


def test_shape_and_skew(events_pdf: pd.DataFrame):
    dml = events_pdf[events_pdf["op"] != "ddl"]
    assert set(dml["op"].unique()) <= {"c", "u", "d"}
    # hot key gets ~5% of events
    top = dml["url"].value_counts().iloc[0] / len(dml)
    assert top > 0.03
    # ~2% rollbacks
    assert 0.005 < dml["rolled_back"].mean() < 0.05
    # seq strictly monotone = emission order
    assert (np.diff(events_pdf["seq"].to_numpy()) > 0).all()
    # ~10% out of warc_ts order
    ts = pd.to_datetime(dml.sort_values("seq")["warc_ts"]).astype("int64").to_numpy()
    frac_ooo = (np.diff(ts) < 0).mean()
    assert 0.01 < frac_ooo < 0.25


def test_text_matches_frozen_extraction(events_pdf: pd.DataFrame):
    sample = events_pdf[events_pdf["html"].notna()].head(200)
    for _, r in sample.iterrows():
        assert extract_text(r["html"]) == r["text"]


def test_ddl_scenario(events_pdf: pd.DataFrame):
    ddl = events_pdf[events_pdf["op"] == "ddl"].sort_values("seq")
    assert list(ddl["action"]) == ["add_column", "widen_type", "rename_column"]
    assert list(ddl["schema_ver"]) == [2, 3, 4]
    # post-v2 dml events carry the evolved column in extras
    post = events_pdf[(events_pdf["schema_ver"] >= 2) & (events_pdf["op"].isin(["c", "u"]))]
    keys = post["extras"].map(lambda e: dict(e).keys() if e is not None else ())
    assert all("fetch_status" in k or "http_status" in k for k in keys)


def test_replayer_semantics(events_pdf: pd.DataFrame):
    final = replay(events_pdf)
    assert final["url"].is_unique
    assert len(final) > 0
    assert {"url", "warc_ts", "html", "text", "lang", "http_status"} <= set(final.columns)
    # every surviving row's text matches the frozen extraction of its html
    for _, r in final.head(100).iterrows():
        assert extract_text(r["html"]) == r["text"]
    # deleted urls absent: pick a url whose winning event is 'd'
    ev = events_pdf[(~events_pdf["rolled_back"]) & (events_pdf["op"] != "ddl")]
    winners = ev.sort_values(["warc_ts", "seq"]).groupby("url").tail(1)
    deleted = set(winners[winners["op"] == "d"]["url"])
    assert deleted, "fixture must contain net-deleted urls"
    assert not (set(final["url"]) & deleted)
    # rollback respected: a rolled-back winner must NOT define final state
    assert len(final) == len(winners) - len(deleted)


def test_linked_pages_plants_all_hazards(tmp_path):
    """write_linked_pages: deterministic bytes + every extraction hazard
    the link-graph gate depends on is actually present in the corpus
    (negative hrefs, uppercase absolute links, self-links, dangling
    hosts — a host that is linked-to but never links out cross-host)."""
    import re

    import pyarrow.parquet as pq

    from openlogreplicator_spark.datagen import write_linked_pages

    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    write_linked_pages(str(d1), n_pages=400, n_hosts=24, seed=17)
    write_linked_pages(str(d2), n_pages=400, n_hosts=24, seed=17)
    b1 = (d1 / "pages-00000.parquet").read_bytes()
    assert b1 == (d2 / "pages-00000.parquet").read_bytes()

    t = pq.read_table(str(d1)).to_pandas()
    allhtml = "\n".join(t.html)
    for marker in (
        'href="/p/relative"', 'href="#top"', 'href="mailto:',
        'href="javascript:', 'href="HTTPS://HOST',
    ):
        assert marker in allhtml, marker

    href_re = re.compile(r'(?is)<a\s[^>]*href="([^"]+)"')
    host_re = re.compile(r"(?i)^https?://([^/?#]+)")
    out_hosts, dst_hosts, self_links = set(), set(), 0
    for _, row in t.iterrows():
        src = host_re.match(row.url).group(1).lower()
        for href in href_re.findall(row.html):
            m = host_re.match(href)
            if not m:
                continue
            dst = m.group(1).lower()
            dst_hosts.add(dst)
            if dst == src:
                self_links += 1
            else:
                out_hosts.add(src)
    assert self_links > 0
    # dangling hosts exist: linked-to yet never linking out cross-host
    assert dst_hosts - out_hosts, (dst_hosts, out_hosts)
