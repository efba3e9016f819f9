"""bench.py is the driver's headline artifact — keep it runnable.

Runs the real bench loop at tiny sizes on the CPU backend and checks the
one-line JSON contract."""

import json

import pytest


def test_bench_main_prints_contract_json(capsys):
    import bench

    bench.main(h=64, w=64, b=2, n=3)
    lines = [
        line for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert set(payload) == {
        "metric", "value", "unit", "vs_baseline", "baseline_provisional",
        "decode_parity", "mfu", "int8_fps",
    }
    # the int8 secondary sweep must have run (its quantized forward
    # works on every backend)
    assert payload["int8_fps"] and payload["int8_fps"] > 0
    assert payload["baseline_provisional"] is True
    # on the CPU backend the decoder runs its XLA fallback path; the
    # bench certifies whichever path the current device executes
    assert payload["decode_parity"] == "ok"
    assert payload["unit"] == "frames/s"
    assert payload["value"] > 0
    # vs_baseline is rounded to 2 decimals in the output, so compare
    # with the matching absolute tolerance
    assert payload["vs_baseline"] == pytest.approx(
        payload["value"] / 12.0, abs=0.005 + 1e-9
    )
