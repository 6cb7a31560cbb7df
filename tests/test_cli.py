"""CLI verbs: compress/decompress/verify/info round-trip through real files."""

import numpy as np
import pytest

from bmh_tpu import cli
from bmh_tpu.utils import container


def test_cli_roundtrip(tmp_path, rng, capsys):
    src = tmp_path / "data.bin"
    enc = tmp_path / "data.bzt"
    dec = tmp_path / "data.out"
    src.write_bytes(bytes(rng.integers(0, 200, 5000, dtype=np.uint8)))

    assert cli.main(["compress", str(src), str(enc), "--backend", "oracle"]) == 0
    assert cli.main(["decompress", str(enc), str(dec), "--backend", "oracle"]) == 0
    assert cli.main(["verify", str(src), str(dec)]) == 0
    assert cli.main(["info", str(enc)]) == 0
    out = capsys.readouterr().out
    assert "success" in out
    assert "n_blocks: 1" in out


def test_cli_verify_fail(tmp_path, capsys):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_bytes(b"xyz")
    b.write_bytes(b"xyw")
    assert cli.main(["verify", str(a), str(b)]) == 1


def test_truncated_container_errors(tmp_path, rng):
    from bmh_tpu import compress_bytes, decompress_bytes

    blob = compress_bytes(bytes(rng.integers(0, 9, 1000, dtype=np.uint8)), backend="oracle")
    with pytest.raises(ValueError, match="truncated|bad magic"):
        decompress_bytes(blob[:10], backend="oracle")
    with pytest.raises(ValueError, match="truncated"):
        decompress_bytes(blob[:-5], backend="oracle")
    with pytest.raises(ValueError, match="bad magic"):
        decompress_bytes(b"XXXX" + blob[4:], backend="oracle")
