from adell_mri_tpu.interop.mapping import (  # noqa: F401
    detect_backbone_prefix,
    load_reference_state_dict,
)
from adell_mri_tpu.interop.torch_resnet import (  # noqa: F401
    import_reference_catnet,
    import_reference_resnet,
    import_reference_resnet_backbone,
)
from adell_mri_tpu.interop.torch_unet import (  # noqa: F401
    import_reference_unet_state_dict,
)
from adell_mri_tpu.interop.torch_vit import (  # noqa: F401
    import_reference_vit_state_dict,
)
from adell_mri_tpu.interop.torch_convnext import (  # noqa: F401
    import_reference_convnext_backbone,
)
from adell_mri_tpu.interop.torch_unetr import (  # noqa: F401
    import_reference_unetr_state_dict,
)
from adell_mri_tpu.interop.torch_swin import (  # noqa: F401
    import_reference_swin_state_dict,
)
