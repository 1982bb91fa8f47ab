#!/usr/bin/env python
"""Round-13 media-fingerprint probe (VERDICT r12 #1): ABBA-timed
signature-stage variants under bench conditions (bench-configured
session, noop sink, alternating order so a roving throttle cannot
favor one variant).

Variants per family:
  fused16   — fused synth+hash at width cores/2 (the r12 HEAD form)
  fused32   — fused synth+hash at full width (one Python worker per
              core; the fused stage's JVM thread is near-idle, so the
              cores/2 rule for JVM+Python pairs does not apply). This
              is the round-13 HEAD form.
  twostage  — r11 form: synthesize (Arrow) -> hash (Arrow), chained in
              one stage = TWO Python workers per task, effective width
              2 x cores/2 = cores
Plus the two full queries (audio_fp_dedup / image_phash_dedup) as a
closing sanity check.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from orca_ztbus_python_processor_spark.session import get_spark  # noqa: E402
from orca_ztbus_python_processor_spark.sources.parquet import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("probe_media_r13")
    sc = spark.sparkContext
    cores = sc.defaultParallelism
    docs = read_table(spark, SF_DIR, "documents")

    from orca_ztbus_python_processor_spark.operators import audiofp, imagehash

    def audio_fused16():
        import pandas as pd  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        def gen(batches):
            for pdf in batches:
                ids, sigs = [], []
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    ids.append(d)
                    sigs.append(
                        audiofp.audiofp64(
                            audiofp.wav_samples(audiofp._audio_payload(d))
                        )
                    )
                yield pd.DataFrame(
                    {"media_id": ids, "afp": np.array(sigs, dtype=np.int64)}
                )

        return docs.select("doc_id").repartition(max(2, cores // 2)).mapInPandas(
            gen, schema="media_id long, afp long"
        )

    def audio_fused32():
        import pandas as pd  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        def gen(batches):
            for pdf in batches:
                ids, sigs = [], []
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    ids.append(d)
                    sigs.append(
                        audiofp.audiofp64(
                            audiofp.wav_samples(audiofp._audio_payload(d))
                        )
                    )
                yield pd.DataFrame(
                    {"media_id": ids, "afp": np.array(sigs, dtype=np.int64)}
                )

        return docs.select("doc_id").repartition(cores).mapInPandas(
            gen, schema="media_id long, afp long"
        )

    def audio_twostage():
        return audiofp.audiofp_signatures(audiofp.synthesize_audio_media(docs))

    def image_fused16():
        import pandas as pd  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        def gen(batches):
            for pdf in batches:
                ids, sigs = [], []
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    fmt, payload = imagehash._phash_payload(d)
                    ids.append(d)
                    sigs.append(
                        imagehash.phash64(
                            imagehash.decode_image_raster(fmt, payload)
                        )
                    )
                yield pd.DataFrame(
                    {"media_id": ids, "phash": np.array(sigs, dtype=np.int64)}
                )

        return docs.select("doc_id").repartition(max(2, cores // 2)).mapInPandas(
            gen, schema="media_id long, phash long"
        )

    def image_fused32():
        import pandas as pd  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        def gen(batches):
            for pdf in batches:
                ids, sigs = [], []
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    fmt, payload = imagehash._phash_payload(d)
                    ids.append(d)
                    sigs.append(
                        imagehash.phash64(
                            imagehash.decode_image_raster(fmt, payload)
                        )
                    )
                yield pd.DataFrame(
                    {"media_id": ids, "phash": np.array(sigs, dtype=np.int64)}
                )

        return docs.select("doc_id").repartition(cores).mapInPandas(
            gen, schema="media_id long, phash long"
        )

    def image_twostage():
        return imagehash.phash_signatures(imagehash.synthesize_phash_media(docs))

    variants = {
        "audio_fused16": audio_fused16,
        "audio_fused32": audio_fused32,
        "audio_twostage": audio_twostage,
        "image_fused16": image_fused16,
        "image_fused32": image_fused32,
        "image_twostage": image_twostage,
    }

    def run(name: str) -> float:
        sc.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        variants[name]().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        return dt

    # warm the Python worker pool + codegen once, untimed
    run("audio_fused16")
    run("image_fused16")

    order = []
    keys = list(variants)
    for rep in range(3):
        seq = keys if rep % 2 == 0 else list(reversed(keys))
        order.extend(seq)

    times: dict[str, list[float]] = {k: [] for k in keys}
    for name in order:
        times[name].append(round(run(name), 4))

    suffix = "_c8" if cores <= 8 else ""
    out = {
        "sf_dir": SF_DIR,
        "cores": cores,
        "times": times,
        "min": {k: min(v) for k, v in times.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in times.items()},
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO_ROOT, ".benchmarks", f"media_fused_probe_r13{suffix}.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
