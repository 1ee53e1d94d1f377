"""Site-specific rewrites (SURVEY §2.7) — pure-function parity with the
reference modules plus the Spark expansion/header surfaces.
Reference: sitespecific/{truthsocial,facebook,libsyn,telegram,tiktok,
vk,reddit}/*.go, capture.go:213-315,396-416."""

from __future__ import annotations

import json

import pytest

from zeno_spark.operators import sitespecific as ss


def test_truthsocial_detection_and_api_url():
    url = "https://truthsocial.com/@user_1/posts/109"
    assert ss.is_truthsocial_post(url)
    assert not ss.is_truthsocial_post("https://truthsocial.com/@user_1")
    assert ss.truthsocial_api_url(url) == "https://truthsocial.com/api/v1/statuses/109"
    assert len(ss.TRUTHSOCIAL_EMBEDS) == 12


def test_facebook_embed_url_query_escaped():
    url = "https://www.facebook.com/page/posts/123?x=1"
    assert ss.is_facebook_post(url)
    embed = ss.facebook_embed_url(url)
    assert embed.startswith("https://www.facebook.com/plugins/post.php?href=")
    assert "https%3A%2F%2Fwww.facebook.com%2Fpage%2Fposts%2F123%3Fx%3D1" in embed
    assert embed.endswith("&show_text=true")


def test_libsyn_highwinds_rewrite():
    url = "https://traffic.libsyn.com/show/E16.mp3"
    assert ss.is_libsyn(url)
    out = ss.libsyn_highwinds_url(url)
    assert out == "https://traffic.libsyn.com/secure/force-cdn/highwinds/show/E16.mp3"
    assert not ss.is_libsyn(out)  # idempotent trigger


def test_telegram_embed_append():
    assert ss.telegram_embed_url("https://t.me/chan/5") == (
        "https://t.me/chan/5?embed=1&mode=tme"
    )
    assert ss.telegram_embed_url("https://t.me/chan/5?x=1") == (
        "https://t.me/chan/5?x=1&embed=1&mode=tme"
    )
    assert ss.is_telegram_embed("https://t.me/c/5?embed=1&mode=tme")


def test_reddit_post_api_extraction():
    body = json.dumps(
        {
            "kind": "Listing",
            "data": {
                "children": [
                    {
                        "kind": "t3",
                        "data": {
                            "permalink": "/r/pics/comments/abc/title/",
                            "url": "https://i.redd.it/img.jpg?width=640&amp;crop=smart",
                            "thumbnail": "https://b.thumbs.example/t.jpg",
                        },
                    }
                ]
            },
        }
    )
    url = "https://www.reddit.com/api/info.json?id=t3_abc"
    assert ss.is_reddit_post_api(url)
    perms, assets = ss.extract_reddit_post(body)
    assert perms == [
        "https://www.reddit.com/r/pics/comments/abc/title/",
        "https://old.reddit.com/r/pics/comments/abc/title/",
    ]
    # amp; stripped then query-unescaped (post.go:215-217)
    assert "https://i.redd.it/img.jpg?width=640&crop=smart" in assets
    assert "https://b.thumbs.example/t.jpg" in assets
    # malformed payload -> empty, never raises
    assert ss.extract_reddit_post("{not json") == ([], [])
    assert ss.extract_reddit_post('{"data": {"children": []}}') == ([], [])


def test_route_extract_dispatches_reddit_branch():
    from zeno_spark.operators.parse import route_extract

    body = json.dumps(
        {"data": {"children": [{"data": {"permalink": "/r/x/comments/1/t/"}}]}}
    )
    outlinks, assets = route_extract(
        "https://www.reddit.com/api/info.json?id=t3_1", "application/json", body
    )
    assert "https://www.reddit.com/r/x/comments/1/t/" in outlinks
    assert "https://old.reddit.com/r/x/comments/1/t/" in outlinks


def test_stub_branches_detect_but_raise():
    assert ss.is_youtube_watch("https://www.youtube.com/watch?v=x")
    assert ss.is_cloudflarestream("https://customer.cloudflarestream.com/v/manifest")
    assert ss.is_ina("https://www.ina.fr/video/I00012345")
    for fn in (ss.capture_ina, ss.capture_cloudflarestream, ss.capture_youtube):
        with pytest.raises(NotImplementedError):
            fn("https://x.example/")


def test_expansion_urls_spark_surface(spark):
    rows = [
        ("https://truthsocial.com/@u/posts/42",),
        ("https://www.facebook.com/p/posts/9",),
        ("https://traffic.libsyn.com/s/e.mp3",),
        ("https://t.me/chan/7",),
        ("https://plain.example/page",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = ss.expansion_urls(df).collect()
    by_branch: dict[str, list[str]] = {}
    for r in out:
        by_branch.setdefault(r.branch, []).append(r.url)
    assert "https://truthsocial.com/api/v1/statuses/42" in by_branch["truthsocial"]
    assert len(by_branch["truthsocial"]) == 12  # api + 11 distinct embeds
    assert by_branch["facebook"] == [ss.facebook_embed_url(rows[1][0])]
    assert by_branch["libsyn"] == [ss.libsyn_highwinds_url(rows[2][0])]
    assert by_branch["telegram"] == [ss.telegram_embed_url(rows[3][0])]
    assert not any("plain.example" in r.parent_url for r in out)


def test_request_headers_col(spark):
    df = spark.createDataFrame(
        [("https://tiktok.com/@u/video/1",),
         ("https://vk.com/wall-1_2",),
         ("https://www.reddit.com/r/x/",),
         ("https://plain.example/",)],
        "url string",
    )
    got = {r.url: r.hdrs for r in df.select("url", ss.request_headers_col().alias("hdrs")).collect()}
    assert got["https://tiktok.com/@u/video/1"]["Authority"] == "www.tiktok.com"
    assert got["https://vk.com/wall-1_2"]["Authority"] == "vk.com"
    assert "over18=1" in got["https://www.reddit.com/r/x/"]["Cookie"]
    assert got["https://plain.example/"] is None


def test_ina_api_media_extraction():
    body = json.dumps(
        {
            "id": "I1",
            "resourceUrl": "https://m.ina.fr/video/I1.mp4",
            "resourceThumbnail": "https://m.ina.fr/I1.jpg",
            "embedUrl": "/player/embed/I1",
            "uri": "https://apipartner.ina.fr/asset/I1",
        }
    )
    assert ss.is_ina_api("https://apipartner.ina.fr/asset/I1?sign=x")
    assert not ss.is_ina_api("https://apipartner.ina.fr/playerConfigurations.json")
    assert ss.extract_ina_medias(body) == [
        "https://m.ina.fr/video/I1.mp4",
        "https://m.ina.fr/I1.jpg",
        "https://player.ina.fr/player/embed/I1",
        "https://apipartner.ina.fr/asset/I1",
    ]
    assert ss.extract_ina_medias("{nope") == []


def test_ina_player_div_attrs():
    html = (
        '<html><body><div data-type="player" '
        'config-url="https://player-hub.ina.fr/cfg.json" '
        'asset-details-url="https://apipartner.ina.fr/asset/I1" '
        'poster="https://m.ina.fr/p.jpg"></div>'
        '<div data-type="other" poster="https://no.example/x.jpg"></div>'
        "</body></html>"
    )
    assert ss.extract_ina_player_attrs(html) == [
        "https://player-hub.ina.fr/cfg.json",
        "https://apipartner.ina.fr/asset/I1",
        "https://m.ina.fr/p.jpg",
    ]


def test_jwplayer_js_asset_extraction():
    js = (
        'var a="//ssl.p.jwpcdn.com/player/plugins/x.js";\n'
        "// JW Player version 8.20.5\n"
        'load("//ssl.p.jwpcdn.com/player/v/8/y.js")'
    )
    out = ss.extract_jwplayer_assets(js)
    assert "https://ssl.p.jwpcdn.com/player/plugins/x.js" in out
    assert "https://ssl.p.jwpcdn.com/player/v/8/y.js" in out
    assert (
        "https://ssl.p.jwpcdn.com/player/v/8.20.5/jwplayer.core.controls.html5.js"
        in out
    )


def test_ytdlp_json_url_selection():
    video = {
        "id": "vid1",
        "is_live": False,
        "requested_formats": [
            {"url": "https://cdn.yt/v.mp4?sig=1", "acodec": "none",
             "vcodec": "avc1", "http_headers": {"User-Agent": "ua"}},
            {"url": "https://cdn.yt/a.m4a?sig=2", "acodec": "mp4a",
             "vcodec": "none", "http_headers": {}},
            {"url": "https://cdn.yt/av.mp4?sig=3", "acodec": "mp4a",
             "vcodec": "avc1", "http_headers": {}},
        ],
        "subtitles": {"en": [{"url": "https://yt.example/sub.vtt"}]},
        "thumbnails": [{"url": "https://yt.example/t.jpg"}],
        "formats": [
            {"format_note": "storyboard", "url": "https://yt.example/sb",
             "fragments": [{"url": "https://yt.example/sb0"}]},
            {"format_note": "dash", "url": "https://yt.example/ignored"},
        ],
    }
    streams, metas, headers = ss.parse_ytdlp_video_json(json.dumps(video))
    assert streams == [
        "https://cdn.yt/v.mp4?sig=1&video_id=vid1&stream_type=video",
        "https://cdn.yt/a.m4a?sig=2&video_id=vid1&stream_type=audio",
        "https://cdn.yt/av.mp4?sig=3&video_id=vid1",
    ]
    assert set(metas) == {
        "https://yt.example/sub.vtt", "https://yt.example/t.jpg",
        "https://yt.example/sb", "https://yt.example/sb0",
    }
    assert headers == {"User-Agent": "ua"}
    # live streams are never archived (ytdlp.go:38-39)
    video["is_live"] = True
    streams, _, _ = ss.parse_ytdlp_video_json(json.dumps(video))
    assert streams == []


def test_route_extract_dispatches_ina_branches():
    from zeno_spark.operators.parse import route_extract

    body = json.dumps({"resourceUrl": "https://m.ina.fr/v.mp4"})
    _, assets = route_extract(
        "https://apipartner.ina.fr/asset/I1", "application/json", body
    )
    assert "https://m.ina.fr/v.mp4" in assets
    html = ('<html><body><div data-type="player" '
            'poster="https://m.ina.fr/p.jpg"></div></body></html>')
    _, assets = route_extract("https://www.ina.fr/video/I1", "text/html", html)
    assert "https://m.ina.fr/p.jpg" in assets


def test_sitespecific_candidates_in_round_shape(spark):
    """§2.7 wiring: derived capture URLs from fetched rows enter the
    candidate pipeline as asset rows with the parent's hop (the batch
    analogue of capture.go's CaptureWithURL recursion); non-matching
    rows expand to nothing."""
    from pyspark.sql import functions as F

    from zeno_spark.config import CrawlConfig
    from zeno_spark.operators.extract import sitespecific_candidates

    ok = spark.createDataFrame(
        [
            ("https://truthsocial.com/@user/posts/112233445566778899", 2),
            ("https://traffic.libsyn.com/show/ep1.mp3", 1),
            ("http://plain.example/page", 0),
        ],
        "url string, hop int",
    )
    cand = sitespecific_candidates(ok, CrawlConfig(), round_no=4)
    rows = cand.collect()
    by_url = {r.url: r for r in rows}
    api = "https://truthsocial.com/api/v1/statuses/112233445566778899"
    assert api in by_url
    assert by_url[api].hop == 2 and by_url[api].type == "asset"
    assert by_url[api].discovered_round == 5
    cdn = "https://traffic.libsyn.com/secure/force-cdn/highwinds/show/ep1.mp3"
    assert cdn in by_url and by_url[cdn].hop == 1
    assert not any("plain.example" in u for u in by_url)
    # FRONTIER-shaped: usable directly by the dedupe/enqueue pipeline
    from zeno_spark import schemas

    assert set(cand.columns) == {f.name for f in schemas.FRONTIER.fields}


# ---------------------------------------------------------------------------
# yt-dlp subprocess dispatch (capture.go:337-395, ytdlp/{server,ytdlp}.go)
# — driven by a FAKE yt-dlp executable on PATH (the container ships none;
# the gate is binary presence, ytdlp.go FindPath)
# ---------------------------------------------------------------------------

_FAKE_YTDLP = '''#!/usr/bin/env python3
import json, sys, urllib.request
# argv: <replay-url> --dump-json -f <format>  (ytdlp.go:15 argument shape)
assert sys.argv[2] == "--dump-json" and sys.argv[3] == "-f", sys.argv
body = urllib.request.urlopen(sys.argv[1]).read().decode()
vid = body.split("vid:")[1].split(" ")[0]
video = {
  "id": vid, "is_live": False,
  "requested_formats": [
    {"url": "https://v.example/s", "acodec": "none", "vcodec": "vp9",
     "http_headers": {"User-Agent": "ua1"}},
    {"url": "https://a.example/s", "acodec": "opus", "vcodec": "none"},
  ],
  "subtitles": {"en": [{"url": "https://s.example/sub.vtt"}]},
  "thumbnails": [{"url": "https://t.example/th.jpg"}],
  "formats": [{"format_note": "storyboard", "url": "https://sb.example/sb",
               "fragments": [{"url": "https://sb.example/f1"}]}],
}
print(json.dumps(video))
'''


@pytest.fixture()
def fake_ytdlp(tmp_path):
    import os
    import stat

    p = tmp_path / "yt-dlp"
    p.write_text(_FAKE_YTDLP)
    os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return str(p)


def test_run_ytdlp_replays_body_through_subprocess(fake_ytdlp):
    """The replay server serves the CAPTURED body (the fake binary
    proves it by echoing the embedded video id back), and the JSON
    selection matches ytdlp.go:getJSON."""
    body = b"<html><!-- vid:abc123 --></html>"
    streams, metas, raw, headers = ss.run_ytdlp(body, binary=fake_ytdlp)
    assert streams == [
        "https://v.example/s&video_id=abc123&stream_type=video",
        "https://a.example/s&video_id=abc123&stream_type=audio",
    ]
    assert metas == [
        "https://s.example/sub.vtt", "https://t.example/th.jpg",
        "https://sb.example/sb", "https://sb.example/f1",
    ]
    assert headers == {"User-Agent": "ua1"}
    assert json.loads(raw)["id"] == "abc123"


def test_capture_youtube_gated_on_binary(monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    with pytest.raises(NotImplementedError, match="yt-dlp"):
        ss.capture_youtube("https://youtube.com/watch?v=x", body=b"x")


def test_ytdlp_sidecar_to_metadata_record(spark, fake_ytdlp, tmp_path):
    """E2E through the S7 sink: fetched watch-page rows -> per-row
    subprocess in the worker -> raw JSON lands in the metadata table
    via write_metadata_records with the reference's content type
    (capture.go:386-389)."""
    from zeno_spark import fixtures
    from zeno_spark.config import CrawlConfig
    from zeno_spark.plans.crawl import CrawlJob

    rows = spark.createDataFrame(
        [
            ("https://youtube.com/watch?v=k1", b"<html><!-- vid:k1 --></html>"),
            ("https://youtube.com/watch?v=k2", b"<html><!-- vid:k2 --></html>"),
            ("https://other.example/page", b"<html>nope</html>"),
        ],
        "url string, bytes binary",
    )
    side = ss.ytdlp_sidecar_rows(rows, binary=fake_ytdlp).cache()
    got = {r.url: r for r in side.collect()}
    assert set(got) == {
        "https://youtube.com/watch?v=k1", "https://youtube.com/watch?v=k2"
    }
    for u, r in got.items():
        assert r.err is None
        assert json.loads(bytes(r.payload))["id"] == u.split("v=")[1]
        assert any("stream_type=video" in x for x in r.urls)

    corpus = fixtures.build_corpus(spark, n_pages=40, n_hosts=4, seed=42)
    job = CrawlJob(spark, str(tmp_path / "wh_yt"), corpus["pages"],
                   corpus["links"], CrawlConfig(max_rounds=1))
    job.run(seeds=corpus["seeds"], max_rounds=1)
    job.write_metadata_records(
        side.filter(side.payload.isNotNull()), round_no=1,
        content_type=ss.YTDLP_METADATA_CONTENT_TYPE,
    )
    recs = job.metadata.read().filter(
        "content_type like '%generator=yt-dlp%'").collect()
    assert {r.url for r in recs} == set(got)
    assert all(r.record_type == "metadata" for r in recs)
    side.unpersist()


def test_ytdlp_sidecar_errors_surface_not_raise(spark, tmp_path):
    """A failing binary must log-and-continue (capture.go:341-346), not
    kill the batch: the row surfaces with err set and no payload."""
    import os
    import stat

    bad = tmp_path / "yt-dlp-bad"
    bad.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
    os.chmod(bad, os.stat(bad).st_mode | stat.S_IEXEC)
    rows = spark.createDataFrame(
        [("https://youtube.com/watch?v=z", b"<html><!-- vid:z --></html>")],
        "url string, bytes binary",
    )
    [r] = ss.ytdlp_sidecar_rows(rows, binary=str(bad)).collect()
    assert r.payload is None and "rc=3" in r.err and r.urls == []
