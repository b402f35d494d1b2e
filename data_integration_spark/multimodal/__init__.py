from data_integration_spark.multimodal.binary_ops import (
    attach_binary_metadata,
    audio_features,
    decode_audio,
    decode_images,
    encode_bmp,
    encode_video,
    extract_features,
    resize_images,
    sample_frames,
    sample_video_frames,
)

__all__ = [
    "attach_binary_metadata",
    "audio_features",
    "decode_audio",
    "decode_images",
    "encode_bmp",
    "encode_video",
    "extract_features",
    "resize_images",
    "sample_frames",
    "sample_video_frames",
]
