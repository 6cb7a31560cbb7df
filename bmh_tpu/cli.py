"""CLI driver: runtime subcommands replacing the reference's compile-time modes.

The reference selects COMPRESS / DECOMPRESS / FULL_PIPELINE at compile time
via preprocessor defines (/root/reference/CMakeLists.txt:6-8,
main.cpp:416-457).  Here they are runtime verbs:

    python -m bmh_tpu compress   <in> <out> [--block-size N] [--backend jax|oracle]
    python -m bmh_tpu decompress <in> <out> [--backend jax|oracle]
    python -m bmh_tpu bench      [--corpus DIR] [--backend jax|oracle] [--block-size N]

`bench` is the FULL_PIPELINE equivalent: compress + decompress + bit-exact
verify over the Calgary corpus with per-file success/fail and `$$` metrics
(main.cpp:416-438).
"""

from __future__ import annotations

import argparse
import sys
import time

from . import api
from .utils import corpus as corpus_mod
from .utils.container import DEFAULT_BLOCK_SIZE
from .utils.metrics import metrics_line


def cmd_compress(args) -> int:
    from .utils.metrics import timer

    with timer() as tbox:
        if args.resumable:
            from .utils.stream import compress_file_resumable
            import os

            info = compress_file_resumable(args.input, args.output,
                                           block_size=args.block_size,
                                           backend=args.backend)
            info["initial_data_size"] = os.path.getsize(args.input)
        else:
            info = api.compress_file(args.input, args.output,
                                     block_size=args.block_size,
                                     backend=args.backend)
    print(metrics_line(args.output, info["initial_data_size"], info["encoded_file_size"],
                       header_size=info.get("header_size"), seconds=tbox["seconds"]))
    return 0


def cmd_decompress(args) -> int:
    t0 = time.perf_counter()
    info = api.decompress_file(args.input, args.output, backend=args.backend)
    dt = time.perf_counter() - t0
    print(metrics_line(args.output, info["decoded_size"], info["encoded_file_size"],
                       seconds=dt))
    return 0


def cmd_bench(args) -> int:
    import os

    d = args.corpus or (str(corpus_mod.corpus_dir()) if corpus_mod.corpus_dir() else None)
    if d is None:
        print("no corpus found; set --corpus or BMH_CORPUS_DIR", file=sys.stderr)
        return 1
    files = args.files.split(",") if args.files else corpus_mod.CALGARY_FILES
    total_in = total_out = 0
    t_start = time.perf_counter()
    failures = 0
    from .utils.tracing import StageTimer

    stages = StageTimer()
    for i, name in enumerate(files, 1):
        path = os.path.join(d, name)
        with open(path, "rb") as f:
            data = f.read()
        t0 = time.perf_counter()
        with stages.stage("compress"):
            blob = api.compress_bytes(data, block_size=args.block_size, backend=args.backend)
        t1 = time.perf_counter()
        with stages.stage("decompress"):
            back = api.decompress_bytes(blob, backend=args.backend)
        t2 = time.perf_counter()
        ok = back == data
        failures += 0 if ok else 1
        total_in += len(data)
        total_out += len(blob)
        from .utils import container as container_mod

        hdr = container_mod.header_bytes(blob)
        print(f"{i}/{len(files)} "
              + metrics_line(name, len(data), len(blob), header_size=hdr,
                             seconds=t1 - t0)
              + f" $$ decode_s: {t2 - t1:.3f} $$ " + ("success" if ok else "fail"))
    wall = time.perf_counter() - t_start
    rate = total_out / total_in if total_in else 0.0
    print(f"TOTAL $$ in: {total_in} $$ out: {total_out} $$ rate: {rate:.4f} "
          f"$$ wall_s: {wall:.2f} $$ roundtrip_MB_per_s: {2 * total_in / wall / 1e6:.3f}")
    print(stages.report())
    from .utils.metrics import json_line

    print(json_line(files=len(files), bytes_in=total_in, bytes_out=total_out,
                    rate=round(rate, 4), wall_s=round(wall, 3),
                    failures=failures))
    return 1 if failures else 0


def cmd_verify(args) -> int:
    """Bit-exact file compare (the reference's compare_files as a CLI verb)."""
    from .utils import nativeio

    equal = nativeio.compare_files(args.a, args.b)
    if equal is None:  # native lib unavailable: python fallback
        with open(args.a, "rb") as f1, open(args.b, "rb") as f2:
            equal = f1.read() == f2.read()
    print("success" if equal else "fail")
    return 0 if equal else 1


def cmd_info(args) -> int:
    import numpy as np

    from .utils import container

    with open(args.input, "rb") as f:
        buf = f.read()
    block_size, total_size, raw_blocks = container.unpack_file(buf)
    print(f"block_size: {block_size} $$ n_blocks: {len(raw_blocks)} "
          f"$$ total_size: {total_size} $$ file_bytes: {len(buf)}")
    for i, raw in enumerate(raw_blocks):
        orig_len, shift, lens, present, cps, rle_len, payload, _pre = container.unpack_block(raw)
        ncp = "periodic" if cps is None else len(cps)
        print(f"block {i}: orig_len {orig_len} $$ shift {shift} "
              f"$$ symbols {int(np.count_nonzero(present))} "
              f"$$ max_code_len {int(lens.max())} $$ rle_len {rle_len} $$ checkpoints {ncp} "
              f"$$ payload {len(payload)} B")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bmh_tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--backend", default="jax", choices=["jax", "oracle"])

    c = sub.add_parser("compress", help="compress a file to .bzt")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--block-size", type=int, default=DEFAULT_BLOCK_SIZE)
    c.add_argument("--resumable", action="store_true",
                   help="streaming layout with per-block checkpoints; "
                        "re-running resumes a crashed compression")
    common(c)
    c.set_defaults(fn=cmd_compress)

    dc = sub.add_parser("decompress", help="decompress a .bzt file")
    dc.add_argument("input")
    dc.add_argument("output")
    common(dc)
    dc.set_defaults(fn=cmd_decompress)

    b = sub.add_parser("bench", help="Calgary benchmark: round-trip + verify")
    b.add_argument("--corpus", default=None)
    b.add_argument("--files", default=None, help="comma-separated subset")
    b.add_argument("--block-size", type=int, default=DEFAULT_BLOCK_SIZE)
    common(b)
    b.set_defaults(fn=cmd_bench)

    v = sub.add_parser("verify", help="bit-exact comparison of two files")
    v.add_argument("a")
    v.add_argument("b")
    v.set_defaults(fn=cmd_verify)

    inf = sub.add_parser("info", help="dump .bzt container metadata")
    inf.add_argument("input")
    inf.set_defaults(fn=cmd_info)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
