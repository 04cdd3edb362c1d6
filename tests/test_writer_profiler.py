"""Writer event bus + profiler utilities."""

import json
import time

from gstk_tpu.utils.profiler import PROFILER, Profiler, time_function, timer
from gstk_tpu.utils.writer import JsonlWriter, LocalWriter, Writer


def test_writer_flush_to_jsonl(tmp_path):
    w = Writer()
    jl = JsonlWriter(tmp_path / "m.jsonl")
    w.backends = [jl]
    w.put_scalar("loss", 0.5, step=1)
    w.put_dict({"psnr": 20.0, "skipme": "str"}, step=1)
    w.write_out_storage()
    w.put_scalar("loss", 0.4, step=2)
    w.write_out_storage()
    rows = [
        json.loads(ln)
        for ln in (tmp_path / "m.jsonl").read_text().splitlines()
    ]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 0.5
    assert rows[0]["psnr"] == 20.0
    assert rows[-1]["loss"] == 0.4


def test_local_writer_no_crash(capsys):
    w = Writer()
    w.backends = [LocalWriter(max_iter=100, log_every=1)]
    w.put_scalar("loss", 1.0, step=10)
    w.write_out_storage()
    out = capsys.readouterr().out
    assert "step 10/100" in out


def test_profiler_accumulates():
    p = Profiler()
    p.update("sec", 0.01)
    p.update("sec", 0.03)
    rep = p.report()
    assert "sec" in rep and "x 2" in rep


def test_time_function_and_timer():
    @time_function
    def work():
        time.sleep(0.01)
        return 42

    assert work() == 42
    with timer("block"):
        time.sleep(0.005)
    assert any("work" in k for k in PROFILER.totals)
    assert "block" in PROFILER.totals
