from protopformer_tpu.checkpoint.torch_convert import (
    convert_deit_state_dict,
    convert_cait_state_dict,
    convert_ppnet_state_dict,
    load_pretrained_backbone,
    load_torch_checkpoint,
    resize_pos_embed,
)
