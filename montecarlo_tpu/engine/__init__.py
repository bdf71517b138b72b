"""Device-resident game engine: pure fixed-shape state transitions.

The reference runs one core.async go-loop per board and per player with all
mutation inside STM transactions (``board.clj:131-138``, ``player.clj:58-69``,
21 ``dosync`` sites). Here the whole table is a flat int/bool array pytree and
every rule is a pure function ``state -> state`` — races are designed out, and
``vmap`` scales the same code to millions of concurrent tables per chip.
"""

from montecarlo_tpu.engine.bets import (  # noqa: F401
    Layers,
    empty_layers,
    merge_bets,
    needed_bet,
    remove_player,
    total_bet,
    update_bets,
)
from montecarlo_tpu.engine.street import (  # noqa: F401
    Street,
    bets_as_layers,
    bets_needed,
    bets_total,
    empty_street,
)
from montecarlo_tpu.engine.state import (  # noqa: F401
    TableConfig,
    TableState,
    begin_hand,
    init_state,
    next_hand,
    redeal,
)
from montecarlo_tpu.engine.step import (  # noqa: F401
    apply_action,
    clamp_action,
    game_end,
    head_info,
    settle_showdown,
    stage_end,
    stage_transition,
    step_action,
    step_table,
)
from montecarlo_tpu.engine.public import public_board, player_hand_json  # noqa: F401
