"""Offline evaluation harness (reference Stats.py:1-285).

Compares SuperSampler result matrices against sourmash and SimKa ground
truth, and tabulates sketch sizes / RAM / time from benchmark logs into
the same long-format CSVs (`value,type,threshold,<metric>,tool`) the
reference produces for its figures.

CLI (python -m supersampler_tpu.eval.stats):
  spsp sourmash simka [--subspsp F] [--subsm F] [-b F] -t TYPE -o OUT
with TYPE in {size, ram, time, error} (reference Stats.py:263-284).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np
import pandas as pd


def _read_fof(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(line)
    return out


def _nums(name):
    return re.findall(r"\d+", name)


def read_simka(path) -> np.ndarray:
    """SimKa distances; similarity = 1 - distance
    (reference Stats.py:48-51)."""
    df = pd.read_csv(path, sep=";", header=0)
    df = df.drop(df.columns[[0]], axis=1)
    return (1 - df).to_numpy()


def read_matrix_csv(path) -> np.ndarray:
    return pd.read_csv(path, sep=",", header=0).to_numpy()


def read_index_size(sub_sourmash, sub_spsp):
    """Sketch sizes in MiB keyed by subsampling rate and tool
    (reference Stats.py:139-172)."""
    data = {}
    for line in _read_fof(sub_sourmash):
        tmp = line.split("/")[-1]
        key = _nums(tmp)[0]
        data.setdefault(key, {})["sourmash_zipped"] = {
            "type": os.stat(line).st_size / (1024 * 1024)}
    for line in _read_fof(sub_spsp):
        tmp = line.split("/")[-1]
        name = "SuperSampler_m" + _nums(tmp)[1]
        key = _nums(tmp)[0]
        data.setdefault(key, {})[name] = {
            "type": os.stat(line).st_size / (1024 * 1024)}
    return data


def read_bench(fof, kind):
    """RAM/time tables from /usr/bin/time-style benchmark logs
    (reference Stats.py:100-135: line 2, tab-separated; RAM = column 3,
    time = last column)."""
    data = {}
    for name in _read_fof(fof):
        tmp = name.split("/")[-1]
        key = _nums(tmp)[0]
        parts = name.split("_")
        with open(name) as bench:
            bench.readline()
            values = bench.readline().strip().split("\t")
        tool = ("SuperSampler_m" + parts[3]) if len(parts) > 5 else "sourmash"
        val = values[2] if kind == "ram" else values[-1]
        data.setdefault(key, {}).setdefault(tool, {})["type"] = val
    return data


def write_csv(data, out, kind):
    with open(out, "w") as f:
        f.write("value,type,threshold," + kind + ",tool\n")
        for key in data:
            for name in data[key]:
                if "diff" in data[key][name]:
                    f.write(f"{data[key][name]['diff']},error,{key},"
                            f"{data[key][name]['type']},{name}\n")
                else:
                    print(f"Missing differences for subsampling rate {key},"
                          f" tool is {name}. Maybe comparisons did not go"
                          " through ?")


def get_error(res_spsp, res_simka, out):
    """|mean(SimKa) - mean(SPSP)| per subsampling rate
    (reference Stats.py:45-98)."""
    simka = read_simka(res_simka)
    data = {}
    for path in _read_fof(res_spsp):
        spsp = read_matrix_csv(path)
        name = path.split("/")[-1]
        key = _nums(name)[0]
        data.setdefault(key, {})["SuperSampler_decycling"] = {
            "type": abs(np.mean(simka) - np.mean(spsp))}
    with open(out, "w") as f:
        f.write("value,type,threshold,error,tool\n")
        for key in data:
            for name in data[key]:
                f.write(f"{data[key][name]['type']},error,{key},0,{name}\n")


def compare_results(res_spsp, res_sourmash, res_simka, data, out, kind):
    """Attach |mean(SimKa) - mean(tool)| differences to the size/ram/time
    table (reference Stats.py:174-251)."""
    simka = read_simka(res_simka)
    files_spsp = _read_fof(res_spsp)
    files_sourmash = []
    for line in _read_fof(res_sourmash):
        files_sourmash.append(line)
        if kind == "size":
            files_sourmash.append(line)
    for path in files_spsp:
        spsp = read_matrix_csv(path)
        name = path.split("/")[-1]
        key = _nums(name)[0]
        tool = "SuperSampler_m" + _nums(name)[1]
        if key in data and tool in data[key]:
            data[key][tool]["diff"] = abs(np.mean(simka) - np.mean(spsp))
        else:
            print(f"should not happen, {tool} not in dict[{key}]"
                  if key in data else f"should not happen, {key} not in dict.")
    for path in files_sourmash:
        sm = read_matrix_csv(path)
        name = path.split("/")[-1]
        key = _nums(name)[0]
        tool = "sourmash_zipped" if kind == "size" else "sourmash"
        if key in data and tool in data[key]:
            data[key][tool]["diff"] = abs(np.mean(simka) - np.mean(sm))
        else:
            print(f"should not happen, {tool} not in dict[{key}]"
                  if key in data else f"should not happen, {key} not in dict.")
    write_csv(data, out, kind)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Stats comparing sourmash and SPSP")
    p.add_argument("spsp")
    p.add_argument("sourmash")
    p.add_argument("simka")
    p.add_argument("--subspsp", required=False)
    p.add_argument("--subsm", required=False)
    p.add_argument("-b", required=False)
    p.add_argument("-t")
    p.add_argument("-o")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)
    if args.t == "size":
        data = read_index_size(args.subsm, args.subspsp)
    elif args.t in ("ram", "time"):
        data = read_bench(args.b, args.t)
    elif args.t == "error":
        get_error(args.spsp, args.simka, args.o)
        return 0
    else:
        sys.exit("INVALID VALUE FOR TYPE.")
    compare_results(args.spsp, args.sourmash, args.simka, data, args.o,
                    args.t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
