from metatransformer_tpu.models import (  # noqa: F401
    audio_classifier,
    classifier,
    hyper_classifier,
    image_classifier,
    tabular_classifier,
    time_series,
    video_classifier,
)
