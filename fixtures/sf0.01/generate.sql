SELECT CAST(request AS VARCHAR) AS request, CAST(series AS VARCHAR) AS series FROM (VALUES
('warmup', '0,1,3,5,8'),
('alt', '5,7,5,9,24')
) AS t(request, series)