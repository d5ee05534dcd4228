"""Golden-corpus runner: replicates the reference's exhaustive fulltext
test harness (tests/unit_tests.py:80-143) against our kernel.

Usage:
  python scripts/run_corpus.py              # summary
  python scripts/run_corpus.py --diff NAME  # char diff for one fixture
  python scripts/run_corpus.py --list       # list failures
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from newspaper_spark.kernel.article import extract_article
from newspaper_spark.kernel.urlutils import get_base_domain

DATA = pathlib.Path("/root/reference/tests/data")

SENTINELS = {
    # fixtures whose golden is a failure note — the reference itself
    # cannot match these (part of its ≤20 allowed failures)
    "dailystar.co.uk1", "dailystar.co.uk2", "pixable.com1", "pixable.com2",
    "recipe.com1", "apartmenttherapy.com1", "pixelmonkey.org1",
    "bostonherald.com1", "newyorker.com1", "thekitchn.com1", "thekitchn.com2",
    "theatlantic.com1", "wetpaint.com1", "wetpaint.com2", "theroot.com1",
    "readwrite.com1", "thenextweb.com1",
    "slate.com1", "apartmenttherapy.com2", "pixelmonkey.org2",
}


def corpus():
    urls = [
        u.strip()
        for u in (DATA / "fulltext_url_list.txt").read_text().splitlines()
        if u.strip()
    ]
    dc = {}
    out = []
    for url in urls:
        d = get_base_domain(url)
        dc[d] = dc.get(d, 0) + 1
        out.append((url, f"{d}{dc[d]}"))
    return out


def run_one(url, name):
    html = (DATA / "html" / f"{name}.html").read_text(encoding="utf-8")
    rec = extract_article(html, url=url)
    golden = (DATA / "text" / f"{name}.txt").read_text(encoding="utf-8")
    return rec, golden


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--diff":
        import difflib

        target = sys.argv[2]
        for url, name in corpus():
            if name == target:
                rec, golden = run_one(url, name)
                sm = difflib.SequenceMatcher(None, golden, rec["text"])
                print(f"ratio={sm.ratio():.4f}")
                for tag, i1, i2, j1, j2 in sm.get_opcodes():
                    if tag != "equal":
                        print(
                            tag,
                            repr(golden[i1:i2])[:300],
                            "||",
                            repr(rec["text"][j1:j2])[:300],
                        )
                return
        print("fixture not found")
        return

    ft_fail, pd_fail = [], []
    for url, name in corpus():
        try:
            rec, golden = run_one(url, name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            ft_fail.append(name)
            pd_fail.append(name)
            continue
        if rec["text"] != golden:
            ft_fail.append(name)
        if rec["publish_date"] is None:
            pd_fail.append(name)
    n = len(list(corpus()))
    nonsent = [f for f in ft_fail if f not in SENTINELS]
    print(f"fulltext failed: {len(ft_fail)}/{n} (bar <=20; sentinels {len([f for f in ft_fail if f in SENTINELS])})")
    print(f"pubdate failed: {len(pd_fail)}/{n} (bar <=47)")
    print(f"non-sentinel fails: {nonsent}")
    if "--list" in sys.argv:
        print("all fails:", ft_fail)
    ok = len(ft_fail) <= 20 and len(pd_fail) <= 47
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
