from mustafar_tpu.models import llama  # noqa: F401
