"""Unit tests for the reference-quirk string functions (SURVEY.md §7.3:
each quirk gets a dedicated test)."""

from no_fasel_scrapers_ray.functions import (
    canonicalize_url,
    clean_genres,
    clean_iframe_source,
    decode_akwam_genres,
    decode_cimanow_genres,
    fix_url,
    normalize_title,
    remove_arabic_chars,
    remove_year,
    stable_id,
    url_hash64,
)
from no_fasel_scrapers_ray.functions.text import (
    clean_anime_title,
    content_format_from_text,
    content_id_from_text,
    fasel_genre_from_href,
)


def test_remove_arabic_chars():
    assert remove_arabic_chars("فيلم Movie مترجم") == "Movie"
    assert remove_arabic_chars("  plain  ") == "plain"
    assert remove_arabic_chars("") == ""


def test_remove_year_quirk():
    # the 5-gram ' 2021' is removed EVERYWHERE it occurs (Common.py:257-264)
    assert remove_year("Movie 2021") == "Movie"
    assert remove_year("A 2021 Story 2021") == "A Story"
    assert remove_year("2021") == "2021"  # len == 4 → untouched
    assert remove_year("No Year Here") == "No Year Here"


def test_clean_iframe_source():
    src = "https://p.test/player?uid=0=https://cdn.test/v/42&img"
    assert clean_iframe_source(src) == "https://cdn.test/v/42"
    assert clean_iframe_source("no-equals-here") == ""
    assert clean_iframe_source("a=b") == ""


def test_fix_url():
    assert fix_url("https://x.test/a b?q=1") == "https://x.test/a%20b"
    assert fix_url("https://x.test/p") == "https://x.test/p"


def test_normalize_title():
    assert normalize_title("The  Big\tShow ") == "thebigshow"


def test_content_id_from_text():
    assert content_id_from_text("رقم الفيلم : #1234") == "1234"
    assert content_id_from_text(": #77") == "77"


def test_content_format():
    assert content_format_from_text("1080p WEB-DL") == "1080p WEB-DL"
    assert content_format_from_text("جودة عالية") == "N/A"
    assert content_format_from_text(None) == "N/A"


def test_genre_decodes():
    assert fasel_genre_from_href("https://f.test/genres/action") == "Action"
    assert decode_akwam_genres(["https://a.test/x?genre=18", "u?genre=23"]) == [
        "Action", "Drama"]
    assert decode_cimanow_genres("اكشن ، رعب") == ["Action", "Horror"]
    assert decode_cimanow_genres("unknown") == [None]


def test_clean_genres():
    assert clean_genres(["Action", "%d8%b1", "/", "Drama"]) == ["Action", "Drama"]


def test_clean_anime_title():
    assert clean_anime_title("The Anime Hunter anime?") == "The  Hunter"


def test_stable_id_deterministic():
    assert stable_id("Some Movie") == stable_id("Some Movie")
    assert len(stable_id("Some Movie")) == 6
    assert stable_id("Some Movie").isdigit()


def test_canonicalize_url():
    assert canonicalize_url("HTTPS://Fasel.TEST/Movies/") == "https://fasel.test/Movies"
    assert canonicalize_url("/page/2", base="https://fasel.test/movies") == \
        "https://fasel.test/page/2"
    assert canonicalize_url("https://a.test/x?page=3#frag") == "https://a.test/x?page=3"
    # idempotent
    u = "https://fasel.test/movies?p=1"
    assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)


def test_url_hash_stable():
    assert url_hash64("https://a.test/x") == url_hash64("https://a.test/x/")
    assert url_hash64("https://a.test/x") != url_hash64("https://a.test/y")
