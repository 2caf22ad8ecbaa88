from supersampler_tpu.sketch.pipeline import TpuSubsampler, sketch_fof
from supersampler_tpu.sketch.stats import print_stat

from supersampler_tpu.io.fasta import get_out_name
from supersampler_tpu.io.gzip_exact import write_gzip_exact


def subsample_file(ss, input_path: str, prefix: str) -> str:
    """Run the full sketch pipeline and write the gzip sketch file
    (reference parse_fasta_test writes zstr level 9,
    SubSampler.cpp:325-326; byte-identical container). Returns the
    output path."""
    out_path = get_out_name(input_path, prefix) + ".gz"
    raw = ss.sketch_file(input_path)
    if raw is None:
        ss.subsampled_file = out_path
        return out_path
    write_gzip_exact(out_path, raw, level=9)
    ss.subsampled_file = out_path
    return out_path


__all__ = ["TpuSubsampler", "print_stat", "sketch_fof",
           "subsample_file"]
