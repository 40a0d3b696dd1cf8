"""Arrow batch sizing microbench for multi-MB media payloads
(VERDICT r10 #10 / guide §4.2 caveat). Synthetic 512x512 RGB PNGs with
random (incompressible) pixels ~= 786 KB raw / ~same compressed, built
with the repo's own encoder seam; pixel_stats timed under different
maxRecordsPerBatch / maxBytesPerBatch settings."""
import os, sys, time, zlib, struct
sys.path.insert(0, "/root/repo")
import numpy as np

def make_png(w, h, seed):
    rng = np.random.default_rng(seed)
    raw = b"".join(b"\x00" + rng.integers(0, 256, w*3, dtype=np.uint8).tobytes() for _ in range(h))
    comp = zlib.compress(raw, 1)
    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp) + chunk(b"IEND", b""))

from hypermap_etl_spark.session import get_spark
from hypermap_etl_spark.operators.multimodal import pixel_stats
spark = get_spark("arrow-batch-bench")
spark.sparkContext.setLogLevel("ERROR")
N, W, H = 96, 1024, 1024
pngs = [(i, make_png(W, H, i), None) for i in range(N)]
print(f"{N} pngs of {len(pngs[0][1])/1e6:.2f} MB each", flush=True)
df = spark.createDataFrame(
    spark.sparkContext.parallelize(pngs, 8),
    "media_id long, payload binary, meta struct<width:int,height:int>",
)
df = df.cache(); df.count()

def run():
    t0 = time.perf_counter()
    pixel_stats(df).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

run()  # warm
for recs, byts in [(10000, None), (100, None), (16, None), (4, None), (1, None),
                   (10000, 16 << 20), (10000, 4 << 20), (10000, 1 << 20)]:
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(recs))
    if byts is None:
        spark.conf.unset("spark.sql.execution.arrow.maxBytesPerBatch")
    else:
        spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", str(byts))
    ts = sorted(run() for _ in range(3))
    print(f"maxRecords={recs} maxBytes={byts}: best={ts[0]:.2f} runs={[round(t,2) for t in ts]}", flush=True)
spark.stop()
