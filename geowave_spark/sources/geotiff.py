"""GeoTIFF raster ingest → DataFrame (pure-spec reader, no GDAL/GeoTools).

The reference ingests rasters through the GeoTools coverage readers
(extensions/formats/geotools-raster/GeoToolsRasterDataStoreIngestPlugin;
RasterUtils.java handles the grid-to-world mapping).  That plugin is a
library binding; the FORMAT is public (TIFF 6.0 + the OGC GeoTIFF 1.1
georeferencing tags), so — like the shapefile and Avro readers — this
module parses it directly:

* pixel payload: `functions/imagecodec.decode_tiff*` (strips/tiles,
  none/deflate/LZW/PackBits, predictor 2, uint/int/float samples);
* georeferencing: ModelPixelScaleTag (33550) + ModelTiepointTag (33922)
  → the affine world footprint; ModelTransformationTag rasters (rotated
  grids) raise clearly;
* CRS: GeoKeyDirectoryTag (34735) → the EPSG code in
  GeographicTypeGeoKey (2048) or ProjectedCSTypeGeoKey (3072);
* nodata: GDAL_NODATA (42113).

Spark-first shape: ``binaryFile`` scan (one task per .tif — the
reference's unit of raster ingest parallelism), metadata parsed in
``mapInPandas``, ORIGINAL bytes carried through with ``fmt='tiff'`` so
rows feed `operators/tiling.mosaic_tiles` (whose per-tile resample
decodes via the registered codec) and `write_indexed` directly — decode
happens once, inside the tile task that needs the pixels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions import imagecodec

GEOTIFF_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bands", T.LongType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("epsg", T.LongType()),
        T.StructField("nodata", T.DoubleType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def geotiff_meta(data: bytes) -> dict:
    """Parse one GeoTIFF's metadata (no pixel decode)."""
    _, t = imagecodec.tiff_tags(data)
    w, h = int(t[256][0]), int(t[257][0])
    spp = int(t.get(277, [1])[0])
    bits = int(t.get(258, [8])[0])
    fmt = int(t.get(339, [1])[0])
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt, "u")
    if 34264 in t:
        raise NotImplementedError(
            "ModelTransformationTag (rotated/sheared grid) not supported — "
            "axis-aligned ModelPixelScale+Tiepoint rasters only"
        )
    if 33550 not in t or 33922 not in t:
        raise ValueError("not a georeferenced GeoTIFF (no scale/tiepoint tags)")
    sx, sy = float(t[33550][0]), float(t[33550][1])
    # tiepoint (i, j, k) raster -> (x, y, z) world; GeoTIFF y axis runs down
    ti, tj, _tk, tx, ty = (float(v) for v in t[33922][:5])
    x0 = tx - ti * sx
    y1 = ty + tj * sy
    epsg = None
    if 34735 in t:
        d = t[34735]
        nkeys = int(d[3])
        found: dict[int, int] = {}
        for k in range(nkeys):
            kid, loc, _cnt, val = (int(v) for v in d[4 + 4 * k : 8 + 4 * k])
            if kid in (2048, 3072) and loc == 0 and val not in (0, 32767):
                found[kid] = val
        # a projected raster carries BOTH keys (its datum's geographic CRS
        # in 2048 plus the projection in 3072) and GeoKeys sort ascending —
        # the PROJECTED code is the raster's actual CRS, so 3072 wins
        epsg = found.get(3072, found.get(2048))
    nodata = None
    if 42113 in t:
        try:
            nodata = float(str(t[42113][0]).strip())
        except ValueError:
            nodata = None
    return {
        "width": w,
        "height": h,
        "bands": spp,
        "dtype": f"{kind}{bits // 8}",
        "x0": x0,
        "y0": y1 - h * sy,
        "x1": x0 + w * sx,
        "y1": y1,
        "epsg": epsg,
        "nodata": nodata,
    }


def read_geotiff(spark: SparkSession, path: str) -> DataFrame:
    """GeoTIFF files → one typed row per raster, original bytes carried
    (``fmt='tiff'``) so the row plugs into `mosaic_tiles(...,
    footprint_cols=("x0", "y0", "x1", "y1"))` and the indexed store."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for pth, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                meta = geotiff_meta(b)
                rows.append(
                    {"source_file": pth, **meta, "bytes": b, "fmt": "tiff"}
                )
            cols = [f.name for f in GEOTIFF_SCHEMA.fields]
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: [] for c in cols}
            )

    return files.select("path", "content").mapInPandas(parse, GEOTIFF_SCHEMA)
