"""DataFrame -> DataFrame spatial operators (the "tools")."""
