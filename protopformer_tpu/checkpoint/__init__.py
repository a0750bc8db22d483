from protopformer_tpu.checkpoint.pretrained import (
    PRETRAINED_URLS,
    download_to_cache,
    resolve_pretrained,
)
from protopformer_tpu.checkpoint.torch_convert import (
    convert_deit_state_dict,
    convert_cait_state_dict,
    convert_ppnet_state_dict,
    export_cait_state_dict,
    export_deit_state_dict,
    export_ppnet_state_dict,
    load_pretrained_backbone,
    load_torch_checkpoint,
    resize_pos_embed,
    save_torch_checkpoint,
)
