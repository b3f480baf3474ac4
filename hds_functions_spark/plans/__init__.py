from .session import DEFAULT_CONF, build_session
