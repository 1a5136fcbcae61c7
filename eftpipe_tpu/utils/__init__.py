from .io import atomic_save_npz
from .dicttools import recursively_update_dict, int_or_list, str_or_list, bool_or_list
