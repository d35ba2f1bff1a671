from sequoia_tpu.models import vis, vit, he2rna, convert  # noqa: F401
