"""Pipeline components: map state, frames, tracking, mapping, loop closing,
relocalization, system facade."""
