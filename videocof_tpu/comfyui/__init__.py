"""ComfyUI registration hook.

The reference repo's root ``__init__.py`` imports
``comfyui.comfyui_nodes.NODE_CLASS_MAPPINGS`` but ships no such directory
(dangling, inherited from VideoX-Fun). This package makes the hook real:
drop/symlink the repo into ComfyUI's ``custom_nodes/`` and the nodes
register; the module also imports standalone (nodes are duck-typed plain
classes — no ComfyUI dependency), so it is testable in CI.
"""

from .comfyui_nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
