SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(q_start AS BIGINT) AS q_start, CAST(db_start AS BIGINT) AS db_start, CAST(window_size AS BIGINT) AS window_size FROM (VALUES
('0', 0, 0, 3),
('132', 0, 49, 3)
) AS t(doc_id, q_start, db_start, window_size)