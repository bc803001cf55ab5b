from metatransformer_tpu.models import classifier, image_classifier  # noqa: F401
