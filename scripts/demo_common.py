"""Shared helpers for the demo scripts (DEMO.md section splicing)."""

import os


def splice_section(section: str, begin: str, end: str, out_env: str = "DEMO_OUT"):
    """Idempotently replace the ``begin``..``end`` marker block in DEMO.md
    (or $DEMO_OUT) with ``section``, appending it if the markers are absent.
    Returns the path written."""
    demo_path = os.environ.get(
        out_env,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "DEMO.md"))
    try:
        text = open(demo_path).read()
    except FileNotFoundError:
        text = ""
    if begin in text and end in text:
        pre, rest = text.split(begin, 1)
        _, post = rest.split(end, 1)
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(demo_path, "w") as f:
        f.write(text)
    return demo_path
