SELECT json_extract_path_text('{"a": {"b": "deep"}}', 'a.b') AS v;
