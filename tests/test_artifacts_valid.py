"""Every committed artifact must be non-empty, parseable JSON — a 0-byte
placeholder in a commit titled "Record ..." misrepresents the record
(VERDICT r7 ask #3; pairseq_10m_r7.json went into the round-7 snapshot
at 0 bytes while the only real record died with /tmp)."""

import json
import pathlib

ART = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "artifacts"


def test_all_artifacts_nonempty_valid_json():
    files = sorted(ART.glob("*.json"))
    assert files, "artifact dir unexpectedly empty"
    for p in files:
        raw = p.read_text()
        assert raw.strip(), f"{p.name} is empty"
        json.loads(raw)  # must parse
