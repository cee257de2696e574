from mpes_spark.io.audio import decode_audio_bytes, read_wav, write_wav
from mpes_spark.io.flac import read_flac, write_flac
from mpes_spark.io.igor import load_ibw, read_waves_ibw, save_ibw
from mpes_spark.io.matlib import loadmat, savemat, whosmat
from mpes_spark.io.images import (
    decode_image_bytes,
    read_bmp,
    read_png,
    read_pnm,
    read_tiff,
    readimg,
    write_png,
    write_pnm,
    write_tiff,
)
from mpes_spark.io.jpeg import read_jpeg, write_jpeg
from mpes_spark.io.mirror import CopyTool
from mpes_spark.io.readers import gather_files, read_table

__all__ = [
    "CopyTool",
    "decode_audio_bytes",
    "decode_image_bytes",
    "gather_files",
    "load_ibw",
    "loadmat",
    "read_bmp",
    "read_flac",
    "read_jpeg",
    "read_png",
    "read_pnm",
    "read_table",
    "read_tiff",
    "read_wav",
    "read_waves_ibw",
    "readimg",
    "save_ibw",
    "savemat",
    "whosmat",
    "write_flac",
    "write_jpeg",
    "write_png",
    "write_pnm",
    "write_tiff",
    "write_wav",
]
