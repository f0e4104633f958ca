SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(q_start AS BIGINT) AS q_start, CAST(db_start AS BIGINT) AS db_start, CAST(window_size AS BIGINT) AS window_size FROM (VALUES
('0', 0, 0, 3),
('50', 0, 0, 3),
('82', 0, 0, 3),
('112', 0, 41, 3),
('133', 0, 54, 3),
('198', 0, 42, 3),
('222', 0, 5, 3),
('275', 0, 34, 3),
('442', 0, 2, 3)
) AS t(doc_id, q_start, db_start, window_size)